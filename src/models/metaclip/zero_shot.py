"""Reference-compatible CLI shim: python -m src.models.metaclip.zero_shot."""

from nextgen_uia_tpu.tasks.metaclip.zero_shot import main

if __name__ == "__main__":
    main()

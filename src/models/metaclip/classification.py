"""Reference-compatible CLI shim: python -m src.models.metaclip.classification."""

from nextgen_uia_tpu.tasks.metaclip.classification import main

if __name__ == "__main__":
    main()

"""Reference-compatible CLI shim: python -m src.models.metaclip.finetune."""

from nextgen_uia_tpu.tasks.metaclip.finetune import main

if __name__ == "__main__":
    main()

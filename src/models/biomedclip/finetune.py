"""Reference-compatible CLI shim: python -m src.models.biomedclip.finetune."""

from nextgen_uia_tpu.tasks.biomedclip.finetune import main

if __name__ == "__main__":
    main()

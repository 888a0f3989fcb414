"""Reference-compatible CLI shim: python -m src.models.unimedclip.finetune."""

from nextgen_uia_tpu.tasks.unimedclip.finetune import main

if __name__ == "__main__":
    main()

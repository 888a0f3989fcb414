"""Reference-compatible CLI shim: python -m src.models.clip.finetune."""

from nextgen_uia_tpu.tasks.clip.finetune import main

if __name__ == "__main__":
    main()

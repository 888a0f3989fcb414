"""Reference-compatible CLI shim: python -m src.models.clip.classification."""

from nextgen_uia_tpu.tasks.clip.classification import main

if __name__ == "__main__":
    main()

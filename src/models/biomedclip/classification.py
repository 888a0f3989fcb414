"""Reference-compatible CLI shim: python -m src.models.biomedclip.classification."""

from nextgen_uia_tpu.tasks.biomedclip.classification import main

if __name__ == "__main__":
    main()

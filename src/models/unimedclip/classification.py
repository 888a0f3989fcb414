"""Reference-compatible CLI shim: python -m src.models.unimedclip.classification."""

from nextgen_uia_tpu.tasks.unimedclip.classification import main

if __name__ == "__main__":
    main()

"""Reference-compatible CLI shim: python -m src.models.biomedclip.segmentation."""

from nextgen_uia_tpu.tasks.biomedclip.segmentation import main

if __name__ == "__main__":
    main()

"""Reference-compatible CLI shim: python -m src.models.unimedclip.segmentation."""

from nextgen_uia_tpu.tasks.unimedclip.segmentation import main

if __name__ == "__main__":
    main()

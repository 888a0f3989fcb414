"""Reference-compatible CLI shim: python -m src.models.clipseg.segmentation."""

from nextgen_uia_tpu.tasks.clipseg.segmentation import main

if __name__ == "__main__":
    main()

"""Reference-compatible CLI shim: python -m src.models.clip.segmentation."""

from nextgen_uia_tpu.tasks.clip.segmentation import main

if __name__ == "__main__":
    main()

"""Reference-compatible CLI shim: python -m src.models.dino.segmentation."""

from nextgen_uia_tpu.tasks.dino.segmentation import main

if __name__ == "__main__":
    main()

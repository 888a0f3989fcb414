"""Reference-compatible CLI shim: python -m src.models.baselines.segmentation."""

from nextgen_uia_tpu.tasks.baselines.segmentation import main

if __name__ == "__main__":
    main()

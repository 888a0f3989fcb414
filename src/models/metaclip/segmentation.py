"""Reference-compatible CLI shim: python -m src.models.metaclip.segmentation."""

from nextgen_uia_tpu.tasks.metaclip.segmentation import main

if __name__ == "__main__":
    main()

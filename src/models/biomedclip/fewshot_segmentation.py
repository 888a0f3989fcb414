"""Reference-compatible CLI shim: python -m src.models.biomedclip.fewshot_segmentation."""

from nextgen_uia_tpu.tasks.biomedclip.fewshot_segmentation import main

if __name__ == "__main__":
    main()

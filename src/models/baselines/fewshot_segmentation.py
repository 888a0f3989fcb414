"""Reference-compatible CLI shim: python -m src.models.baselines.fewshot_segmentation."""

from nextgen_uia_tpu.tasks.baselines.fewshot_segmentation import main

if __name__ == "__main__":
    main()

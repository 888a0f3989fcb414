"""Reference-compatible CLI shim: python -m src.models.baselines.fewshot_classification."""

from nextgen_uia_tpu.tasks.baselines.fewshot_classification import main

if __name__ == "__main__":
    main()

"""Reference-compatible CLI shim: python -m src.models.baselines.classification."""

from nextgen_uia_tpu.tasks.baselines.classification import main

if __name__ == "__main__":
    main()

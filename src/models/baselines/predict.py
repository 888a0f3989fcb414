"""Serving CLI shim: python -m src.models.baselines.predict (beyond-reference batch inference)."""

from nextgen_uia_tpu.tasks.baselines.predict import main

if __name__ == "__main__":
    main()

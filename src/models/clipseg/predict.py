"""Serving CLI shim: python -m src.models.clipseg.predict (beyond-reference batch inference)."""

from nextgen_uia_tpu.tasks.clipseg.predict import main

if __name__ == "__main__":
    main()

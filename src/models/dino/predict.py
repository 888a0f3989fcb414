"""Serving CLI shim: python -m src.models.dino.predict (beyond-reference batch inference)."""

from nextgen_uia_tpu.tasks.dino.predict import main

if __name__ == "__main__":
    main()

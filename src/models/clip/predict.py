"""Serving CLI shim: python -m src.models.clip.predict (beyond-reference batch inference)."""

from nextgen_uia_tpu.tasks.clip.predict import main

if __name__ == "__main__":
    main()

"""Serving CLI shim: python -m src.models.biomedclip.predict (beyond-reference batch inference)."""

from nextgen_uia_tpu.tasks.biomedclip.predict import main

if __name__ == "__main__":
    main()

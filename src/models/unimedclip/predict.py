"""Serving CLI shim: python -m src.models.unimedclip.predict (beyond-reference batch inference)."""

from nextgen_uia_tpu.tasks.unimedclip.predict import main

if __name__ == "__main__":
    main()

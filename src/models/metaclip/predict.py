"""Serving CLI shim: python -m src.models.metaclip.predict (beyond-reference batch inference)."""

from nextgen_uia_tpu.tasks.metaclip.predict import main

if __name__ == "__main__":
    main()

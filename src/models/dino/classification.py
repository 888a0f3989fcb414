"""Reference-compatible CLI shim: python -m src.models.dino.classification."""

from nextgen_uia_tpu.tasks.dino.classification import main

if __name__ == "__main__":
    main()

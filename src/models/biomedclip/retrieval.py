"""Reference-compatible CLI shim: python -m src.models.biomedclip.retrieval."""

from nextgen_uia_tpu.tasks.biomedclip.retrieval import main

if __name__ == "__main__":
    main()

"""Reference-compatible CLI shim: python -m src.models.biomedclip.fewshot_classification."""

from nextgen_uia_tpu.tasks.biomedclip.fewshot_classification import main

if __name__ == "__main__":
    main()

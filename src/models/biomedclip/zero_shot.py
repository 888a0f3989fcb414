"""Reference-compatible CLI shim: python -m src.models.biomedclip.zero_shot."""

from nextgen_uia_tpu.tasks.biomedclip.zero_shot import main

if __name__ == "__main__":
    main()

"""Reference-compatible CLI shim: python -m src.models.unimedclip.zero_shot."""

from nextgen_uia_tpu.tasks.unimedclip.zero_shot import main

if __name__ == "__main__":
    main()

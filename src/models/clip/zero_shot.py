"""Reference-compatible CLI shim: python -m src.models.clip.zero_shot."""

from nextgen_uia_tpu.tasks.clip.zero_shot import main

if __name__ == "__main__":
    main()

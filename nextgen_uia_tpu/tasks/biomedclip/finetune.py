"""CLI: python -m nextgen_uia_tpu.tasks.biomedclip.finetune (reference: src/models/biomedclip/finetune.py)."""

from ..clip_finetune import finetune_main


def main(argv=None):
    return finetune_main('biomedclip', argv)


if __name__ == "__main__":
    main()

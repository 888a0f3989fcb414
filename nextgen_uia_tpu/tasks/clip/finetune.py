"""CLI: python -m nextgen_uia_tpu.tasks.clip.finetune (reference: src/models/clip/finetune.py)."""

from ..clip_finetune import finetune_main


def main(argv=None):
    return finetune_main('openai', argv)


if __name__ == "__main__":
    main()

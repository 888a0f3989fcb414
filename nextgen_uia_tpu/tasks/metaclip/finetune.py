"""CLI: python -m nextgen_uia_tpu.tasks.metaclip.finetune (reference: src/models/metaclip/finetune.py)."""

from ..clip_finetune import finetune_main


def main(argv=None):
    return finetune_main('metaclip', argv)


if __name__ == "__main__":
    main()

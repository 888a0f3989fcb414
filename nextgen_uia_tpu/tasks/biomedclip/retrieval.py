"""CLI: python -m nextgen_uia_tpu.tasks.biomedclip.retrieval (reference: src/models/biomedclip/retrieval.py)."""

from ..clip_finetune import retrieval_main


def main(argv=None):
    return retrieval_main('biomedclip', argv)


if __name__ == "__main__":
    main()

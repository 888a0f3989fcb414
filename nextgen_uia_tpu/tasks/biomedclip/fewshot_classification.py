"""CLI: python -m nextgen_uia_tpu.tasks.biomedclip.fewshot_classification (reference: src/models/biomedclip/fewshot_classification.py)."""

from ..clip_tasks import supervised_main


def main(argv=None):
    return supervised_main('biomedclip', 'cls', argv, fewshot=True)


if __name__ == "__main__":
    main()

"""CLI: python -m nextgen_uia_tpu.tasks.baselines.classification (reference: src/models/baselines/classification.py)."""

from ..other_tasks import baselines_classification_main


def main(argv=None):
    return baselines_classification_main(argv)


if __name__ == "__main__":
    main()

"""CLI: python -m nextgen_uia_tpu.tasks.dino.classification (reference: src/models/dino/classification.py)."""

from ..other_tasks import dino_classification_main


def main(argv=None):
    return dino_classification_main(argv)


if __name__ == "__main__":
    main()

"""CLI: python -m nextgen_uia_tpu.tasks.baselines.fewshot_classification (reference: src/models/baselines/fewshot_classification.py)."""

from ..other_tasks import baselines_classification_main


def main(argv=None):
    return baselines_classification_main(argv, fewshot=True)


if __name__ == "__main__":
    main()

"""CLI: python -m nextgen_uia_tpu.tasks.baselines.fewshot_segmentation (reference: src/models/baselines/fewshot_segmentation.py)."""

from ..other_tasks import baselines_segmentation_main


def main(argv=None):
    return baselines_segmentation_main(argv, fewshot=True)


if __name__ == "__main__":
    main()

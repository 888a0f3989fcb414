"""CLI: python -m nextgen_uia_tpu.tasks.baselines.segmentation (reference: src/models/baselines/segmentation.py)."""

from ..other_tasks import baselines_segmentation_main


def main(argv=None):
    return baselines_segmentation_main(argv)


if __name__ == "__main__":
    main()

"""CLI: python -m nextgen_uia_tpu.tasks.clipseg.segmentation (reference: src/models/clipseg/segmentation.py)."""

from ..other_tasks import clipseg_segmentation_main


def main(argv=None):
    return clipseg_segmentation_main(argv)


if __name__ == "__main__":
    main()

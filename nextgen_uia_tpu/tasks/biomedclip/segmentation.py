"""CLI: python -m nextgen_uia_tpu.tasks.biomedclip.segmentation (reference: src/models/biomedclip/segmentation.py)."""

from ..clip_tasks import supervised_main


def main(argv=None):
    return supervised_main('biomedclip', 'seg', argv)


if __name__ == "__main__":
    main()

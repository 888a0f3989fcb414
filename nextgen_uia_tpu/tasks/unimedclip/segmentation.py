"""CLI: python -m nextgen_uia_tpu.tasks.unimedclip.segmentation (reference: src/models/unimedclip/segmentation.py)."""

from ..clip_tasks import supervised_main


def main(argv=None):
    return supervised_main('unimedclip', 'seg', argv)


if __name__ == "__main__":
    main()

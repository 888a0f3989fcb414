"""CLI: python -m nextgen_uia_tpu.tasks.unimedclip.classification (reference: src/models/unimedclip/classification.py)."""

from ..clip_tasks import supervised_main


def main(argv=None):
    return supervised_main('unimedclip', 'cls', argv)


if __name__ == "__main__":
    main()

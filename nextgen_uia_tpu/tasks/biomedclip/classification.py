"""CLI: python -m nextgen_uia_tpu.tasks.biomedclip.classification (reference: src/models/biomedclip/classification.py)."""

from ..clip_tasks import supervised_main


def main(argv=None):
    return supervised_main('biomedclip', 'cls', argv)


if __name__ == "__main__":
    main()

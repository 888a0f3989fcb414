"""CLI: python -m nextgen_uia_tpu.tasks.biomedclip.zero_shot (reference: src/models/biomedclip/zero_shot.py)."""

from ..clip_tasks import zero_shot_main


def main(argv=None):
    return zero_shot_main('biomedclip', argv)


if __name__ == "__main__":
    main()

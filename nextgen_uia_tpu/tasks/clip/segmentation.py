"""CLI: python -m nextgen_uia_tpu.tasks.clip.segmentation (reference: src/models/clip/segmentation.py)."""

from ..clip_tasks import supervised_main


def main(argv=None):
    return supervised_main('openai', 'seg', argv)


if __name__ == "__main__":
    main()

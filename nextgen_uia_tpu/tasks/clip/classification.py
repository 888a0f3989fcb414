"""CLI: python -m nextgen_uia_tpu.tasks.clip.classification (reference: src/models/clip/classification.py)."""

from ..clip_tasks import supervised_main


def main(argv=None):
    return supervised_main('openai', 'cls', argv)


if __name__ == "__main__":
    main()

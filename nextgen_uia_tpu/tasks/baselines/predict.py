"""CLI: python -m nextgen_uia_tpu.tasks.baselines.predict (serving path — no reference analogue)."""

from ..serve import predict_main


def main(argv=None):
    return predict_main('baselines', argv)


if __name__ == "__main__":
    main()

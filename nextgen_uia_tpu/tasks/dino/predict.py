"""CLI: python -m nextgen_uia_tpu.tasks.dino.predict (serving path — no reference analogue)."""

from ..serve import predict_main


def main(argv=None):
    return predict_main('dino', argv)


if __name__ == "__main__":
    main()

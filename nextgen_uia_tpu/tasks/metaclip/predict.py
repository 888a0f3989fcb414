"""CLI: python -m nextgen_uia_tpu.tasks.metaclip.predict (serving path — no reference analogue)."""

from ..serve import predict_main


def main(argv=None):
    return predict_main('metaclip', argv)


if __name__ == "__main__":
    main()

"""`python -m empanada_tpu <command> [...]` — unified CLI dispatcher."""

import sys

COMMANDS = {
    "train": "empanada_tpu.cli.train",
    "finetune": "empanada_tpu.cli.finetune",
    "infer3d": "empanada_tpu.cli.infer3d",
    "export": "empanada_tpu.cli.export",
    "evaluate3d": "empanada_tpu.cli.evaluate3d",
    "evaluate3d-bc": "empanada_tpu.cli.evaluate3d_bc",
}


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help") \
            or sys.argv[1] not in COMMANDS:
        print("usage: python -m empanada_tpu "
              f"{{{','.join(COMMANDS)}}} [args...]")
        raise SystemExit(0 if len(sys.argv) >= 2
                         and sys.argv[1] in ("-h", "--help") else 2)
    import importlib

    mod = importlib.import_module(COMMANDS[sys.argv[1]])
    mod.main(sys.argv[2:])


if __name__ == "__main__":
    main()

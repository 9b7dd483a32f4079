"""`anemoi-tpu-training` CLI.

Equivalent of the reference's `anemoi-training train/evaluate/config` commands
(/root/reference/training/src/anemoi/training/commands/).
"""

from __future__ import annotations

import argparse
import logging
import sys


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
    parser = argparse.ArgumentParser(prog="anemoi-tpu-training")
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="Train a model from a YAML config")
    p_train.add_argument("config", help="YAML config path")
    p_train.add_argument("overrides", nargs="*", help="a.b.c=value overrides")
    p_train.add_argument("--output-dir", default=None)

    p_val = sub.add_parser("validate", help="Validate config without training")
    p_val.add_argument("config")
    p_val.add_argument("overrides", nargs="*")

    args = parser.parse_args(argv)

    from anemoi_tpu.utils.config import load_config

    cfg = load_config(args.config, overrides=list(args.overrides))

    if args.command == "validate":
        from anemoi_tpu.training.schemas import validate_config

        validate_config(cfg.to_dict())
        print("config OK")
        return 0

    if args.command == "train":
        from anemoi_tpu.training.schemas import validate_config
        from anemoi_tpu.training.trainer import AnemoiTrainer

        if cfg.get("config_validation", True):
            validate_config(cfg.to_dict())
        trainer = AnemoiTrainer(cfg.to_dict(), output_dir=args.output_dir)
        result = trainer.train()
        print(f"training done: {result}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())

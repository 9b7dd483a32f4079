"""`anemoi-tpu-training` CLI.

Equivalent of the reference's `anemoi-training train/evaluate/config` commands
(/root/reference/training/src/anemoi/training/commands/).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def _apply_hardware_platform(hw: dict) -> None:
    """Force the JAX platform / virtual-device count from ``hardware:`` config
    BEFORE backend init (equivalent of the reference's hardware config group,
    /root/reference/training/src/anemoi/training/config/hardware/).

    Some TPU plugins ignore the ``JAX_PLATFORMS`` env var, so
    ``hardware.platform: cpu`` must go through ``jax.config``; the
    host-platform device count (for mesh testing without chips) must land in
    ``XLA_FLAGS`` before the first backend query."""
    platform = hw.get("platform")
    n_virtual = hw.get("num_virtual_devices")
    if n_virtual:
        flag = f"--xla_force_host_platform_device_count={int(n_virtual)}"
        if flag not in os.environ.get("XLA_FLAGS", ""):
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "") + " " + flag
            ).strip()
    if platform:
        import jax

        jax.config.update("jax_platforms", str(platform))


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

    p_eval = sub.add_parser("evaluate", help="Validation pass from the latest checkpoint")
    p_eval.add_argument("config")
    p_eval.add_argument("overrides", nargs="*")
    p_eval.add_argument("--output-dir", default=None)
    p_eval.add_argument("--rollout", type=int, default=None)

    p_cfg = sub.add_parser("config", help="Inspect / dump composed configs")
    cfg_sub = p_cfg.add_subparsers(dest="config_command", required=True)
    p_cfg_gen = cfg_sub.add_parser("generate", help="Dump the fully composed config")
    p_cfg_gen.add_argument("config")
    p_cfg_gen.add_argument("overrides", nargs="*")
    p_cfg_gen.add_argument("--output", default=None)
    p_cfg_list = cfg_sub.add_parser("list", help="List packaged presets")

    p_ckpt = sub.add_parser("checkpoint", help="Inspect / migrate checkpoints")
    ckpt_sub = p_ckpt.add_subparsers(dest="checkpoint_command", required=True)
    p_ck_insp = ckpt_sub.add_parser("inspect", help="Summarise an inference checkpoint")
    p_ck_insp.add_argument("checkpoint")
    p_ck_mig = ckpt_sub.add_parser("migrate", help="Apply pending migrations")
    p_ck_mig.add_argument("checkpoint", nargs="?", default=None)
    p_ck_mig.add_argument("--create", default=None, metavar="LABEL",
                          help="Scaffold a timestamped migration script instead")
    p_ck_mig.add_argument("--scripts-dir", default=None,
                          help="Directory for --create (default: packaged scripts)")
    p_ck_mig.add_argument("--rollback", default=None, metavar="TARGET",
                          help="Roll the checkpoint back to migration TARGET")

    p_pred = sub.add_parser("predict", help="Autoregressive forecast from an inference checkpoint")
    p_pred.add_argument("checkpoint", help="Inference checkpoint directory")
    p_pred.add_argument("--config", default=None, help="Config with data.datasets for initial conditions (default: the checkpoint's bundled config)")
    p_pred.add_argument("--steps", type=int, default=4)
    p_pred.add_argument("--start-index", type=int, default=0)
    p_pred.add_argument("--output", default="forecast.npz")
    p_pred.add_argument("--seed", type=int, default=0,
                        help="RNG seed for generative (transport) forecasts")
    p_pred.add_argument("--platform", default=None,
                        help="Force the JAX platform for serving (e.g. cpu); "
                             "default: the environment's backend")
    p_pred.add_argument("--aot-cache", default=None,
                        help="Directory for serialized compiled executables: "
                             "serving cold starts reload in ~0.1s instead of "
                             "recompiling (also env ANEMOI_TPU_AOT_CACHE)")

    p_mlf = sub.add_parser("mlflow", help="Offline-run sync and server auth")
    mlf_sub = p_mlf.add_subparsers(dest="mlflow_command", required=True)
    p_mlf_login = mlf_sub.add_parser("login", help="Store a tracking server URI + token")
    p_mlf_login.add_argument("--uri", required=True)
    p_mlf_login.add_argument("--token", default=None)
    p_mlf_sync = mlf_sub.add_parser(
        "sync", help="Push offline FileStore runs to a tracking server"
    )
    p_mlf_sync.add_argument("run_dir", help="Offline run directory (or mlruns root)")
    p_mlf_sync.add_argument("--uri", default=None, help="Tracking server (default: saved login)")
    p_mlf_sync.add_argument("--experiment", default=None)

    p_prof = sub.add_parser("profile", help="Short profiled run with speed/memory reports")
    p_prof.add_argument("config")
    p_prof.add_argument("overrides", nargs="*")
    p_prof.add_argument("--output-dir", default=None)
    p_prof.add_argument("--steps", type=int, default=20)
    p_prof.add_argument("--trace", action="store_true")
    p_prof.add_argument("--benchmark-store", default=None,
                        help="Push results to this commit-keyed store directory")

    args = parser.parse_args(argv)

    if args.command == "predict":
        # platform must land before anything on the inference import chain
        # can touch the jax backend (first backend init pins the platform)
        if args.platform:
            _apply_hardware_platform({"platform": args.platform})

        from anemoi_tpu.inference import run_forecast_cli

        return run_forecast_cli(args)

    if args.command == "mlflow":
        import json

        auth_path = os.path.expanduser("~/.config/anemoi_tpu/mlflow.json")
        if args.mlflow_command == "login":
            os.makedirs(os.path.dirname(auth_path), exist_ok=True)
            with open(auth_path, "w") as f:
                json.dump({"uri": args.uri, "token": args.token}, f)
            os.chmod(auth_path, 0o600)
            print(f"Saved tracking server login to {auth_path}")
            return 0
        if args.mlflow_command == "sync":
            from anemoi_tpu.training.mlflow_store import sync_offline_run

            auth = {}
            if os.path.exists(auth_path):
                with open(auth_path) as f:
                    auth = json.load(f)
            uri = args.uri or auth.get("uri")
            if not uri:
                print("No tracking URI: pass --uri or run `mlflow login` first")
                return 1
            # accept a single run dir or an mlruns root full of runs
            run_dirs = []
            if os.path.exists(os.path.join(args.run_dir, "meta.yaml")) and (
                os.path.isdir(os.path.join(args.run_dir, "metrics"))
            ):
                run_dirs = [args.run_dir]
            else:
                for exp in sorted(os.listdir(args.run_dir)):
                    exp_dir = os.path.join(args.run_dir, exp)
                    if not os.path.isdir(exp_dir):
                        continue
                    for run in sorted(os.listdir(exp_dir)):
                        cand = os.path.join(exp_dir, run)
                        if os.path.isdir(os.path.join(cand, "metrics")):
                            run_dirs.append(cand)
            for rd in run_dirs:
                run_id = sync_offline_run(
                    rd, uri, experiment=args.experiment, token=auth.get("token")
                )
                print(f"synced {rd} -> {uri} run {run_id}")
            return 0

    if args.command == "config" and args.config_command == "list":
        import anemoi_tpu

        root = os.path.join(os.path.dirname(anemoi_tpu.__file__), "config")
        for dirpath, _, files in sorted(os.walk(root)):
            for f in sorted(files):
                if f.endswith(".yaml"):
                    print(os.path.relpath(os.path.join(dirpath, f), root))
        return 0

    if args.command == "checkpoint":
        import json

        if args.checkpoint_command == "inspect":
            with open(os.path.join(args.checkpoint, "checkpoint.json")) as f:
                bundle = json.load(f)
            from anemoi_tpu.models.migrations import MIGRATOR

            info = {
                "format_version": bundle.get("metadata", {}).get("format_version"),
                "migrations_applied": bundle.get("metadata", {}).get("migrations", []),
                "migrations_pending": [m.name for m in MIGRATOR.pending(bundle)],
                "datasets": list(bundle.get("data_indices", {})),
                "model": bundle.get("config", {}).get("model", {}).get("name"),
                "num_params": bundle.get("metadata", {}).get("num_params"),
                "provenance": bundle.get("metadata", {}).get("provenance"),
            }
            print(json.dumps(info, indent=1))
            return 0
        if args.checkpoint_command == "migrate":
            from anemoi_tpu.models.migrations import (
                MIGRATOR,
                create_migration_script,
            )

            if args.create:
                path = create_migration_script(args.create, args.scripts_dir)
                print(f"created {path}")
                return 0
            if not args.checkpoint:
                print("error: checkpoint path required (or use --create LABEL)")
                return 2
            path = os.path.join(args.checkpoint, "checkpoint.json")
            with open(path) as f:
                bundle = json.load(f)
            if args.rollback:
                before = MIGRATOR.applied(bundle)
                bundle = MIGRATOR.rollback_to(bundle, args.rollback)
                undone = [n for n in before if n not in MIGRATOR.applied(bundle)]
                with open(path, "w") as f:
                    json.dump(bundle, f, default=str)
                print(f"rolled back {len(undone)} migrations: {undone}")
                return 0
            pending = [m.name for m in MIGRATOR.pending(bundle)]
            bundle = MIGRATOR.migrate(bundle)
            with open(path, "w") as f:
                json.dump(bundle, f, default=str)
            print(f"applied {len(pending)} migrations: {pending}")
            return 0

    import anemoi_tpu
    from anemoi_tpu.utils.config import load_config

    packaged = os.path.join(os.path.dirname(anemoi_tpu.__file__), "config")
    cfg = load_config(
        args.config, overrides=list(args.overrides), search_paths=[packaged]
    )
    _apply_hardware_platform(cfg.to_dict().get("hardware", {}))

    if args.command == "config":  # generate (list handled above)
        import yaml

        text = yaml.safe_dump(cfg.to_dict(), sort_keys=False)
        if args.output:
            with open(args.output, "w") as f:
                f.write(text)
            print(f"composed config -> {args.output}")
        else:
            print(text)
        return 0

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

    if args.command == "evaluate":
        from anemoi_tpu.training.trainer import AnemoiTrainer

        conf = cfg.to_dict()
        conf.setdefault("training", {})["resume"] = True
        trainer = AnemoiTrainer(conf, output_dir=args.output_dir)
        rollout = args.rollout or trainer.rollout_schedule.maximum
        trainer.datamodule.set_rollout(rollout)
        val = trainer.validate(rollout)
        from anemoi_tpu.training.metrics import make_rollout_eval_fn

        fn = make_rollout_eval_fn(trainer.interface, rollout)
        import jax as _jax
        import numpy as _np

        agg = {}
        for i, batch_np in enumerate(trainer.datamodule.val_batches()):
            out = fn(trainer.state.params, _jax.device_put(batch_np))
            for k, v in out.items():
                agg.setdefault(k, []).append(float(v))
            if i >= 4:
                break
        metrics = {k: float(_np.mean(v)) for k, v in agg.items()}
        print(f"evaluation: {val} {metrics}")
        return 0

    if args.command == "profile":
        from anemoi_tpu.training.profiler import profile_training
        from anemoi_tpu.training.trainer import AnemoiTrainer

        trainer = AnemoiTrainer(cfg.to_dict(), output_dir=args.output_dir)
        result = profile_training(trainer, num_steps=args.steps, trace=args.trace)
        print(f"profile: {result}")
        if args.benchmark_store:
            from anemoi_tpu.training.benchmark_store import BenchmarkStore

            store = BenchmarkStore(args.benchmark_store)
            commit = store.push(
                {k: v for k, v in result.items() if isinstance(v, (int, float))}
            )
            comparison = store.compare(
                {k: v for k, v in result.items() if isinstance(v, (int, float))}
            )
            print(f"benchmark store: commit={commit[:12]} {comparison}")
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())

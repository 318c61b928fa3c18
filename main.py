"""AdvMIL-TPU entry point.

CLI-compatible with the reference (reference main.py:55-121):
    python3 main.py --config <yaml> --handler {adv,base} [--multi_run]

Dispatch: semi_training -> exec_semi_sl(), test -> exec_test(), else exec().
--multi_run expands every list-valued YAML key into a hyperparameter grid and
runs each combo with a derived save_path suffix (the canonical use is 5-fold
CV via data_split_seed: [0,1,2,3,4]).
"""
import argparse
import os

if os.environ.get("ADVMIL_FORCE_CPU") == "1":
    import jax
    jax.config.update("jax_platforms", "cpu")

from advmil_tpu.config import get_config, grid, grid_hyperparams, with_defaults
from advmil_tpu.utils.func import print_config


def run_one(handler_cls, config):
    model = handler_cls(config)
    if config.get("semi_training"):
        metrics = model.exec_semi_sl()
    elif config.get("test"):
        metrics = model.exec_test()
    else:
        metrics = model.exec()
    print("[INFO] Metrics:", metrics)
    return metrics


def multi_run_main(handler_cls, config):
    hyperparams = grid_hyperparams(config)
    for cnf in grid(config):
        print("\n")
        for k in hyperparams:
            cnf["save_path"] += f"-{k}_{cnf[k]}"
        print(cnf["save_path"])
        run_one(handler_cls, with_defaults(cnf))


def get_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", "-f", required=True, type=str,
                        help="path to the config file")
    parser.add_argument("--handler", "-d", required=True, type=str,
                        help="model handler (adv or base)")
    parser.add_argument("--multi_run", action="store_true",
                        help="flag: multi run (grid over list-valued keys)")
    return vars(parser.parse_args())


if __name__ == "__main__":
    args = get_args()
    config = get_config(args["config"])
    # multi-host (DCN) wiring must precede any backend use; a no-op unless
    # dist_* config keys / ADVMIL_* env vars request multiple processes
    from advmil_tpu.parallel.dist import maybe_initialize
    maybe_initialize(config)
    print_config(config)
    if args["handler"] == "adv":
        from advmil_tpu.train.handler import AdvHandler as handler_cls
    elif args["handler"] == "base":
        from advmil_tpu.train.baseline import BaselineHandler as handler_cls
    else:
        raise SystemExit(f"unknown handler {args['handler']} (use adv|base)")
    if args["multi_run"]:
        multi_run_main(handler_cls, config)
    else:
        run_one(handler_cls, config)

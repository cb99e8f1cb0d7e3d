#!/usr/bin/env python
"""CLI entrypoint — reference-parity public surface (main_v2.py):

    python main.py dataset=cub200 model=concepthash optim=sgd model.nbit=64
    python main.py --config-name val exp=validation logdir=logs/...
    python main.py exp=extract logdir=logs/...

exp modes: 'hashing' (train+retrieve), 'general' (train, best=min test loss),
'validation'/'descriptor'/'extract' (eval-only; 'validation' reloads the run's
saved config and overlays eval knobs — reference main_v2.py:22-41).
"""

from __future__ import annotations

import os
import sys


def parse_argv(argv):
    config_name = "train"
    overrides = []
    it = iter(argv)
    for arg in it:
        if arg in ("--config-name", "-cn"):
            config_name = next(it)
        elif arg.startswith("--config-name="):
            config_name = arg.split("=", 1)[1]
        elif arg in ("--help", "-h"):
            print(__doc__)
            from concepthash_tpu.methods import list_methods

            print("methods:", ", ".join(list_methods()))
            sys.exit(0)
        else:
            overrides.append(arg)
    return config_name, overrides


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    config_name, overrides = parse_argv(argv)

    config_dir = os.environ.get(
        "CONCEPTHASH_CONFIG_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs"))

    from concepthash_tpu.config import load_config
    from concepthash_tpu.config.loader import load_saved_config, _Resolver

    # "exp=validation" with the train config means the user wants val.yaml
    exp_hint = next((o.split("=", 1)[1] for o in overrides
                     if o.startswith("exp=")), None)
    if exp_hint in ("validation", "descriptor", "extract") and config_name == "train":
        config_name = "val"

    config = load_config(config_dir, config_name, overrides)
    exp_mode = config.get("exp", "hashing")

    saved_cfg_path = os.path.join(config.get("logdir") or "", "config.yaml")
    if exp_mode == "validation" or (
            exp_mode in ("descriptor", "extract") and "model" not in config
            and os.path.exists(saved_cfg_path)):
        # reload the run's saved config, overlay eval knobs (main_v2.py:22-41)
        saved = load_saved_config(saved_cfg_path)
        for key in ("data_dir", "work_dir", "R", "PRs", "use_last", "compute_mAP",
                    "ternary_threshold", "dist_metric", "batch_size", "save_code",
                    "sub_code_eval", "sub_code_eval_setting", "zero_mean_eval",
                    "test_as_database", "eval_logdir", "logdir", "seed"):
            if key in config:
                saved[key] = config[key]
        if config.get("dataset"):
            saved["dataset"] = config["dataset"]
        saved["exp"] = exp_mode
        config = saved

    from concepthash_tpu.experiments import (
        GeneralExperiment,
        RetrievalEvaluation,
        RetrievalExperiment,
    )

    if exp_mode == "general":
        experiment = GeneralExperiment(config)
    elif exp_mode == "hashing":
        experiment = RetrievalExperiment(config)
    elif exp_mode in ("validation", "descriptor", "extract"):
        experiment = RetrievalEvaluation(config)
    else:
        raise ValueError(f'unknown exp mode: "{exp_mode}"')

    return experiment.main()


if __name__ == "__main__":
    main()

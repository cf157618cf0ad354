"""Sweep harness — generate and run the TFAM ablation grid.

The reference reproduces its paper Table 2 with 21 hand-written YAMLs
executed sequentially by a shell script (TFAM/cfg_AK/config_*.yaml,
TFAM/run_experiments.sh; axes catalogued in SURVEY.md #20). Here the sweep
is generated programmatically from the same axes:

  fusion mode   x {cross-attention, rgb-only, motion-only,
                   concat temporal (dim=1), concat channel (dim=-1)}
  use_pe        x {false, true}
  dropout       x {0.1, 0.2}
  mlp_dropout   x {0.1, 0.3}
  batch_size    x {4, 8}

``generate`` writes the named subset (default: the reference's 21-run grid)
as YAML files; ``run`` executes every config in a directory sequentially and
tabulates best val mAP per run.
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os

import yaml

from vimoclip_tpu.utils.logging import setup_logging

# The reference's sweep: default + 20 variations (SURVEY.md #20). Each entry
# overrides the base model/training sections.
REFERENCE_GRID: list[dict] = [
    {},  # config_default: cross-attention
    {"model": {"use_cross_attention": False, "concat_dim": 1}},
    {"model": {"use_cross_attention": False, "concat_dim": -1}},
    {"model": {"use_only_rgb": True, "use_cross_attention": False}},
    {"model": {"use_only_flow": True, "use_cross_attention": False}},
    {"model": {"use_pe": True}},
    {"model": {"use_pe": True, "use_cross_attention": False, "concat_dim": 1}},
    {"model": {"use_pe": True, "use_cross_attention": False, "concat_dim": -1}},
    {"model": {"use_pe": True, "use_only_rgb": True, "use_cross_attention": False}},
    {"model": {"use_pe": True, "use_only_flow": True, "use_cross_attention": False}},
    {"model": {"dropout": 0.2}},
    {"model": {"dropout": 0.2, "mlp_dropout": 0.3}},
    {"model": {"mlp_dropout": 0.3}},
    {"training": {"batch_size": 4}},
    {"training": {"batch_size": 4}, "model": {"dropout": 0.2}},
    {"training": {"batch_size": 4}, "model": {"mlp_dropout": 0.3}},
    {"model": {"use_cross_attention": False, "concat_dim": 1, "dropout": 0.2}},
    {"model": {"use_cross_attention": False, "concat_dim": -1, "dropout": 0.2}},
    {"model": {"use_cross_attention": False, "concat_dim": 1, "mlp_dropout": 0.3}},
    {"model": {"use_cross_attention": False, "concat_dim": -1, "mlp_dropout": 0.3}},
    {"training": {"batch_size": 4}, "model": {"use_pe": True}},
]


def base_config(data_overrides: dict | None = None) -> dict:
    """The reference's shared YAML schema (cfg_AK/config_default.yaml)."""
    cfg = {
        "training": {
            "mode": "both", "seed": 49, "lr": 1.0e-4, "epochs": 30,
            "batch_size": 8, "num_workers": 4,
        },
        "logging": {"log_dir": "logs", "checkpoint_dir": "checkpoints"},
        "data": {
            "num_classes": 140,
            "class_names_dir": "dataset/annotations/ak_action.csv",
            "train_dataset_path": "", "val_dataset_path": "",
            "frame_diff_dataset_path": "",
        },
        "model": {
            "d_model": 512, "nhead": 8, "num_layers": 4,
            "dim_feedforward": 2048, "use_cross_attention": True,
            "use_only_rgb": False, "use_only_flow": False, "use_pe": False,
            "concat_dim": 1, "dropout": 0.1, "mlp_dropout": 0.1,
        },
    }
    if data_overrides:
        cfg["data"].update(data_overrides)
    return cfg


def generate(out_dir: str, data_overrides: dict | None = None) -> list[str]:
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, overrides in enumerate(REFERENCE_GRID):
        cfg = base_config(data_overrides)
        for section, vals in overrides.items():
            cfg[section].update(vals)
        name = "config_default.yaml" if i == 0 else f"config_{i}.yaml"
        path = os.path.join(out_dir, name)
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)
        paths.append(path)
    return paths


def run(config_dir: str, results_path: str) -> list[dict]:
    from vimoclip_tpu.config import derive_run_dirs, load_experiment_config
    from vimoclip_tpu.prng import set_seed
    from vimoclip_tpu.train.tfam_trainer import TFAMTrainer

    results = []
    for path in sorted(glob.glob(os.path.join(config_dir, "config_*.yaml"))):
        logging.info("=== %s ===", path)
        config = load_experiment_config(path)
        set_seed(config.training.seed)
        log_dir, ckpt_dir = derive_run_dirs(config)
        trainer = TFAMTrainer(config, log_dir=log_dir, checkpoint_dir=ckpt_dir)
        best = trainer.train()
        results.append({"config": os.path.basename(path), "best_val_mAP": best})
        with open(results_path, "w") as f:
            json.dump(results, f, indent=2)  # incremental, crash-safe
    try:
        from tabulate import tabulate

        print(tabulate(
            [(r["config"], f"{r['best_val_mAP']:.4f}") for r in results],
            headers=["config", "best val mAP"], tablefmt="pretty",
        ))
    except ImportError:
        pass
    return results


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="TFAM ablation sweep")
    sub = p.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("generate", help="write the sweep configs")
    g.add_argument("--out-dir", default="configs/cfg_AK")
    g.add_argument("--train-h5", default="")
    g.add_argument("--val-h5", default="")
    g.add_argument("--motion-h5", default="")
    r = sub.add_parser("run", help="run every config in a directory")
    r.add_argument("--config-dir", default="configs/cfg_AK")
    r.add_argument("--results", default="sweep_results.json")
    args = p.parse_args(argv)

    setup_logging()
    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    if args.cmd == "generate":
        overrides = {}
        if args.train_h5:
            overrides["train_dataset_path"] = args.train_h5
        if args.val_h5:
            overrides["val_dataset_path"] = args.val_h5
        if args.motion_h5:
            overrides["frame_diff_dataset_path"] = args.motion_h5
        paths = generate(args.out_dir, overrides)
        print(f"wrote {len(paths)} configs to {args.out_dir}")
    else:
        run(args.config_dir, args.results)


if __name__ == "__main__":
    main()

"""Stage-2 CLI: train and/or evaluate the TFAM fusion model from a YAML
config — the reference's ``python TFAM/train_and_eval.py --config cfg.yaml``
surface (TFAM/train_and_eval.py:313-407), including the MammalNet variant
via ``training.loss: ce`` / ``training.metric: accuracy`` instead of a
separate near-duplicate script (the reference keeps three ~identical files,
SURVEY.md #17-19)."""

from __future__ import annotations

import argparse
import logging

from vimoclip_tpu.config import derive_run_dirs, load_experiment_config
from vimoclip_tpu.prng import set_seed
from vimoclip_tpu.train.tfam_trainer import TFAMTester, TFAMTrainer
from vimoclip_tpu.utils.logging import setup_logging


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description="Train and/or evaluate TFAM")
    parser.add_argument("--config", type=str, default="config_default.yaml",
                        help="path to YAML config")
    parser.add_argument("--run-name", type=str, default=None,
                        help="run directory name (default: timestamp)")
    parser.add_argument("--torch-checkpoint", type=str, default=None,
                        help="evaluate a reference-trained best_model.pth "
                             "instead of this run's Orbax checkpoint")
    args = parser.parse_args(argv)

    config = load_experiment_config(args.config)
    set_seed(config.training.seed)
    setup_logging()
    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    log_dir, ckpt_dir = derive_run_dirs(config, args.run_name)
    logging.info("run dirs: logs=%s checkpoints=%s", log_dir, ckpt_dir)

    trainer = TFAMTrainer(config, log_dir=log_dir, checkpoint_dir=ckpt_dir)

    if config.training.mode in ("train", "both"):
        trainer.train()

    if config.training.mode in ("test", "both"):
        tester = TFAMTester(trainer)
        if args.torch_checkpoint:
            tester.load_torch_checkpoint(args.torch_checkpoint)
        else:
            tester.load_best()
        tester.evaluate(save_predictions=True, top_k=5)


if __name__ == "__main__":
    main()

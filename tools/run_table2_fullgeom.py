#!/usr/bin/env python
"""Table-2 fusion-mode contrast at the FULL flagship geometry on the chip
(VERDICT r4 #2): train d512/8h/4L/ff2048 TFAM — the reference's real
architecture (/root/reference/TFAM/AMO_CLIP.py:6-51, cfg_AK defaults) with
its dropout-0.1 / AdamW / per-epoch-cosine recipe — on the two-factor
synthetic cascade corpus, for cross-attention vs temporal-concat vs
rgb-only vs flow-only, and assert the paper's directional ordering
(BASELINE.md: cross 77.09 / concat_t 76.99 >= rgb 75.83 >> flow 51.05).

Why this exists: the always-on `make sweep` pins the 21-config grid at a
d24 toy geometry — ordering there does not demonstrate that the FLAGSHIP
width learns the cross-attention advantage (optimization dynamics don't
transfer across a 21x width change). This tool runs the contrast at the
real geometry; the corpus is scaled up (48 train videos/class) and the val
split is DISJOINT with fresh random textures, so d512 cannot fake the
ordering by memorizing — generalisation requires actually using the color
(RGB-only) and motion (diff-only) factors.

The corpus uses the ORDER-ONLY motion factor (build_corpus order_only=True)
rather than the toy sweep's mean-neutral flicker: at d512 the flicker's
per-frame brightness alternation is visible in rgb embeddings and a
4-layer transformer classifies it in one epoch (measured 0.97 rgb-only
val mAP — the corpus premise broke at flagship width). With equal frame
multisets per motion class, the no-PE + mean-pooled rgb tower is a
permutation-invariant function of the frame set and thus provably blind
to frame order; the diff stream turns order into magnitude.

Two phases, two processes:
  1. corpus build in a CPU subprocess (tiny-teacher extraction + frame-diff
     export; forcing CPU there keeps the chip free and avoids paying tunnel
     compiles for throwaway extraction shapes);
  2. the four training arms in THIS process on the default backend (the
     chip under axon). bench.py's persistent compile cache keeps the
     per-mode tunnel compile a one-time cost.

Usage:
    python tools/run_table2_fullgeom.py --out SWEEP_FULLGEOM.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

# the FLAGSHIP geometry: reference cfg_AK/config_default.yaml + AMO_CLIP.py
GEOMETRY = {"d_model": 512, "nhead": 8, "num_layers": 4,
            "dim_feedforward": 2048, "dropout": 0.1, "mlp_dropout": 0.1}
RECIPE = {"epochs": 30, "batch_size": 8, "lr": 1e-4, "weight_decay": 0.1,
          "eta_min": 1e-6, "seed": 49}
CORPUS = {"videos_per_class": 48, "val_videos_per_class": 16,
          "projection_dim": 512, "order_only": True}

# fusion modes -> TFAMModelConfig flags (cli/run_experiments.py mapping)
MODES = {
    "cross": {"use_cross_attention": True},
    "concat_t": {"use_cross_attention": False, "concat_dim": 1},
    "rgb": {"use_only_rgb": True},
    "flow": {"use_only_flow": True},
}


def _build_corpus_cpu(work: str, seed: int) -> None:
    """Phase 1 in a subprocess: CPU-pinned corpus build (see module doc)."""
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--phase", "corpus",
         "--work-dir", work, "--seed", str(seed)],
        text=True, timeout=3600,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"corpus build failed (rc={proc.returncode})")


def _corpus_phase(work: str, seed: int) -> None:
    from run_table2_sweep import _force_cpu, build_corpus

    _force_cpu()
    os.makedirs(work, exist_ok=True)
    paths = build_corpus(work, seed=seed, **CORPUS)
    print(f"corpus: {paths}")


def run_mode(mode: str, work: str, run_dir: str) -> dict:
    import jax

    from vimoclip_tpu.config import (
        DataConfig, ExperimentConfig, LoggingConfig, TFAMModelConfig,
        TrainingConfig,
    )
    from vimoclip_tpu.train.tfam_trainer import TFAMTrainer

    cfg = ExperimentConfig(
        training=TrainingConfig(
            # resume=True makes reruns RECOVER rather than redo: an arm
            # preempted mid-epoch continues from the guard's checkpoint,
            # a completed arm restores its recorded best and returns
            # immediately, and a fresh work dir starts from scratch (no
            # checkpoint -> no restore). Clear --work-dir to re-measure.
            mode="train", num_workers=2, half_precision=False, resume=True,
            **RECIPE,
        ),
        logging=LoggingConfig(),
        data=DataConfig(
            num_classes=6,
            class_names_dir=os.path.join(work, "classes.csv"),
            train_dataset_path=os.path.join(work, "rgb.h5"),
            val_dataset_path=os.path.join(work, "rgb_val.h5"),
            frame_diff_dataset_path=os.path.join(work, "motion.h5"),
            # 8..13-frame clips all pad to ONE bucket -> one compiled train
            # step per mode (tunnel compiles are the cost ceiling here)
            length_bucket=16,
        ),
        model=TFAMModelConfig(**GEOMETRY, **MODES[mode]),
    )
    t0 = time.time()
    trainer = TFAMTrainer(
        cfg,
        log_dir=os.path.join(run_dir, mode, "logs"),
        checkpoint_dir=os.path.join(run_dir, mode, "ckpt"),
    )
    import math

    best_val_map = float(trainer.train())
    res = {
        "mode": mode,
        # preempted before the first validation -> -inf, which json.dump
        # would serialize as non-RFC -Infinity
        "best_val_mAP": (round(best_val_map, 4)
                         if math.isfinite(best_val_map) else None),
        "wall_s": round(time.time() - t0, 1),
        "train_steps": int(trainer.state.step),
        "backend": jax.default_backend(),
    }
    if trainer.preempted:
        res["status"] = "preempted"
    return res


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="SWEEP_FULLGEOM.json")
    p.add_argument("--work-dir", default="/tmp/table2_fullgeom")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--phase", choices=["all", "corpus", "train"],
                   default="all")
    p.add_argument("--modes", default=",".join(MODES))
    args = p.parse_args(argv)
    work = os.path.abspath(args.work_dir)

    if args.phase == "corpus":
        _corpus_phase(work, args.seed)
        return 0

    t0 = time.time()
    if args.phase == "all":
        if os.path.exists(os.path.join(work, "rgb_val.h5")):
            print(f"corpus: reusing {work}")
        else:
            _build_corpus_cpu(work, args.seed)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vimo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from vimoclip_tpu.utils.logging import setup_logging

    setup_logging()
    run_dir = os.path.join(work, "runs")
    results = []
    preempted = False
    for mode in args.modes.split(","):
        res = run_mode(mode, work, run_dir)
        results.append(res)
        print(json.dumps(res), flush=True)
        if res.get("status") == "preempted":
            # SIGTERM mid-arm: PreemptionGuard checkpointed the in-flight
            # trainer, but the grace deadline is ticking — do NOT start the
            # next hours-long arm. Write the partial artifact and exit;
            # rerunning resumes this arm from its checkpoint.
            preempted = True
            print(f"preempted during '{mode}': stopping sweep", flush=True)
            break

    by = {r["mode"]: r["best_val_mAP"] for r in results}
    ordering_ok = None
    if not preempted and set(by) >= {"cross", "rgb", "flow"}:
        ordering_ok = bool(
            by["cross"] >= by["rgb"] + 0.05
            and by["rgb"] >= by["flow"] + 0.15
            and (by.get("concat_t", by["rgb"]) >= by["rgb"] - 1e-9)
        )
    artifact = {
        "sweep": "Table-2 fusion-mode contrast at FULL flagship geometry "
                 "(AMO_CLIP.py:6-51; paper ordering per BASELINE.md)",
        "corpus": {"kind": "two-factor cascade, DISJOINT val textures",
                   **CORPUS},
        "geometry": GEOMETRY,
        "recipe": RECIPE,
        "results": results,
        "best_val_mAP": by,
        "ordering_ok": ordering_ok,
        "preempted": preempted,
        "wall_s": round(time.time() - t0, 1),
    }
    with open(os.path.abspath(args.out), "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"fullgeom sweep -> {args.out}; ordering_ok={ordering_ok} "
          f"({by})")
    # 1 only for an EVALUATED ordering failure or a preempted partial run;
    # a --modes subset (ordering_ok=None, not evaluated) is a success.
    if preempted:
        return 1
    return 0 if ordering_ok is not False else 1


if __name__ == "__main__":
    sys.exit(main())

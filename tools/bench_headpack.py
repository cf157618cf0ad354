#!/usr/bin/env python
"""A/B: one vs two heads per Pallas program instance, bench.py's exact TFAM
train-step recipe on the real chip (VERDICT r4 #1 / docs/PERF.md ledger 18).

The flash kernels' score/PV contractions are d_head=64 wide — half the
128-wide MXU — so one head's chain serialises MXU matmuls against VPU
softmax/dropout work (~58 TF/s measured at hb=1). Packing two heads per
program gives Mosaic's scheduler two INDEPENDENT chains to interleave:
head j's VPU work can run under head j+1's matmuls. Numerics are identical
per head (same tiles, same order, same dropout streams).

Usage: python tools/bench_headpack.py [--iters 32] [--dropout 0.1]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (  # noqa: E402
    MEASURED_CEILING_TFLOPS,
    TFAM_RECIPE,
    _best_of,
    _transformer_flops,
)


def run_tfam_arm(hb_force: int | None, iters: int, dropout: float) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from vimoclip_tpu import losses
    from vimoclip_tpu.config import TFAMModelConfig
    from vimoclip_tpu.models import TFAM
    from vimoclip_tpu.ops.pallas import flash_attention as fa

    if hb_force is not None:
        fa._heads_per_block = lambda h, _f=int(hb_force): (
            _f if h % _f == 0 else 1
        )
    jax.clear_caches()  # same shapes both arms — don't reuse traced calls

    r = TFAM_RECIPE
    b, t, d, layers, ff, classes = (
        r["b"], r["t"], r["d"], r["layers"], r["ff"], r["classes"]
    )
    import dataclasses

    cfg = TFAMModelConfig(d_model=d, nhead=8, num_layers=layers,
                          dim_feedforward=ff, attention_impl="auto")
    if dropout != cfg.dropout:
        cfg = dataclasses.replace(cfg, dropout=dropout, mlp_dropout=dropout)
    model = TFAM(config=cfg, num_classes=classes, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    motion = jnp.asarray(rng.normal(size=(b, t - 1, d)).astype(np.float32))
    mr, mf = jnp.ones((b, t), bool), jnp.ones((b, t - 1), bool)
    labels = jnp.asarray((rng.random((b, classes)) < 0.05).astype(np.float32))
    params = model.init(jax.random.key(0), rgb, motion, mr, mf)["params"]
    tx = optax.adamw(1e-4, weight_decay=0.1)
    opt = tx.init(params)

    @jax.jit
    def timed(params, opt, key, rgb, motion, mr, mf, labels):
        def body(carry, i):
            p, o = carry

            def loss_fn(p):
                logits = model.apply(
                    {"params": p}, rgb, motion, mr, mf,
                    deterministic=False,
                    rngs={"dropout": jax.random.fold_in(key, i)},
                )
                return losses.bce_with_logits(logits, labels)

            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (_, _), ls = jax.lax.scan(body, (params, opt), jnp.arange(iters))
        return jnp.sum(ls)

    key = jax.random.key(1, impl="rbg")
    args = (params, opt, key, rgb, motion, mr, mf, labels)
    float(timed(*args))  # compile + warm
    best = _best_of(lambda: float(timed(*args)), n=5)
    ms = best / iters * 1e3
    fwd = b * _transformer_flops(t, d, ff, layers, cross=True)
    tflops = 3 * fwd / (best / iters) / 1e12
    return {
        "heads_per_block": hb_force,
        "ms_per_step": round(ms, 3),
        "clips_per_sec": round(b * iters / best, 1),
        "tflops": round(tflops, 1),
        "mfu": round(tflops / MEASURED_CEILING_TFLOPS, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=TFAM_RECIPE["iters"])
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--arms", default="1,2",
                    help="comma-separated heads-per-block values to run")
    args = ap.parse_args()

    # persistent compile cache (bench.py behavior): repeat runs skip the
    # minutes-long tunnel compiles
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vimo_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    print(f"backend={jax.default_backend()} iters={args.iters} "
          f"dropout={args.dropout}")
    results = []
    for arm in args.arms.split(","):
        res = run_tfam_arm(int(arm), args.iters, args.dropout)
        results.append(res)
        print(res, flush=True)
    if len(results) == 2:
        speedup = results[0]["ms_per_step"] / results[1]["ms_per_step"]
        print(f"hb={results[1]['heads_per_block']} vs "
              f"hb={results[0]['heads_per_block']}: {speedup:.3f}x")


if __name__ == "__main__":
    main()

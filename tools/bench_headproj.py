#!/usr/bin/env python
"""A/B: head_proj="split" vs "fused" on the real chip, bench.py's exact
TFAM train-step recipe (VERDICT r3 #3 / docs/PERF.md trace: the 0.60 ms
"data formatting" + 0.41 ms copy slices are the head-major transposes XLA
keeps around the flash kernel; "fused" folds the head split/merge into the
projection einsums so XLA can materialise the head-major layout as the
matmul output instead).

Usage: python tools/bench_headproj.py [--iters 32] [--impl auto]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import MEASURED_CEILING_TFLOPS, TFAM_RECIPE, _best_of, _transformer_flops  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=TFAM_RECIPE["iters"])
    p.add_argument("--impl", default="auto", choices=["auto", "xla", "flash"])
    p.add_argument("--dropout", type=float, default=0.1)
    args = p.parse_args()

    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from vimoclip_tpu import losses
    from vimoclip_tpu.config import TFAMModelConfig
    from vimoclip_tpu.models import TFAM

    print("backend:", jax.default_backend(), jax.devices())
    r = TFAM_RECIPE
    b, t, d, layers, ff, classes = (
        r["b"], r["t"], r["d"], r["layers"], r["ff"], r["classes"]
    )
    iters = args.iters
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    motion = jnp.asarray(rng.normal(size=(b, t - 1, d)).astype(np.float32))
    mr, mf = jnp.ones((b, t), bool), jnp.ones((b, t - 1), bool)
    labels = jnp.asarray((rng.random((b, classes)) < 0.05).astype(np.float32))
    tx = optax.adamw(1e-4, weight_decay=0.1)
    key = jax.random.key(1, impl="rbg")

    results = {}
    params0 = None
    for head_proj in ("split", "fused", "fused_qkv"):
        model = TFAM(
            config=TFAMModelConfig(
                d_model=d, nhead=8, num_layers=layers, dim_feedforward=ff,
                attention_impl=args.impl, dropout=args.dropout,
                mlp_dropout=args.dropout, head_proj=head_proj,
            ),
            num_classes=classes, dtype=jnp.bfloat16,
        )
        params = model.init(jax.random.key(0), rgb, motion, mr, mf)["params"]
        if params0 is None:
            params0 = params
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

        a = (params, opt, key, rgb, motion, mr, mf, labels)
        float(timed(*a))  # compile + warm
        best = _best_of(lambda: float(timed(*a)), n=5)
        ms = best / iters * 1e3
        step_flops = 3 * b * _transformer_flops(t, d, ff, layers, cross=True)
        tf = step_flops / (best / iters) / 1e12
        results[head_proj] = ms
        print(f"{head_proj}: {ms:.3f} ms/step  {tf:.1f} TF/s "
              f"({tf / MEASURED_CEILING_TFLOPS:.1%} MFU)")

    for tag in ("fused", "fused_qkv"):
        print(f"{tag} vs split: {results['split'] / results[tag]:.4f}x")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B: head_proj="split" vs "fused" on the real chip, bench.py's exact
TFAM train-step recipe (VERDICT r3 #3 / docs/PERF.md trace: the 0.60 ms
"data formatting" + 0.41 ms copy slices are the head-major transposes XLA
keeps around the flash kernel; "fused" folds the head split/merge into the
projection einsums so XLA can materialise the head-major layout as the
matmul output instead).

Usage: python tools/bench_headproj.py [--iters 32] [--impl auto]
       python tools/bench_headproj.py --target extraction
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (  # noqa: E402
    EXTRACTION_RECIPE,
    MEASURED_CEILING_TFLOPS,
    STUDENT_RECIPE,
    TFAM_RECIPE,
    _best_of,
    _make_frames,
    _transformer_flops,
    make_extraction_timed,
)


def run_student(args) -> None:
    """Same A/B on the stage-1 student TRAIN step (ViT-B/32 backbone,
    bench.py's exact recipe/harness incl. the anti-hoist pixel perturb)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vimoclip_tpu import losses
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig
    from vimoclip_tpu.models.student import StudentModel

    print("backend:", jax.default_backend(), jax.devices())
    r = STUDENT_RECIPE
    b, t, h, w, classes = r["b"], r["t"], r["h"], r["w"], r["classes"]
    iters = r["iters"]
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, t, h, w, 3), dtype=np.uint8))
    teacher = jnp.asarray(rng.normal(size=(b, t, 512)).astype(np.float32))
    labels = jnp.asarray((rng.random((b, classes)) < 0.05).astype(np.float32))
    tx = optax.adam(1e-4)
    results = {}
    for head_proj in ("split", "fused", "fused_qkv"):
        cfg = dataclasses.replace(ClipVisionConfig.vit_b_32(),
                                  head_proj=head_proj)
        model = StudentModel(vision_config=cfg, num_classes=classes,
                             dtype=jnp.bfloat16)
        params = model.init(jax.random.key(0), frames)["params"]
        opt = tx.init(params)

        @jax.jit
        def timed(params, opt, frames, teacher, labels):
            def body(carry, i):
                p, o = carry
                fr = frames.at[0, 0, 0, 0, 0].set(i.astype(jnp.uint8))

                def loss_fn(p):
                    _, distill, logits = model.apply({"params": p}, fr)
                    d = losses.distillation_loss(distill, teacher, "cosine")
                    c = losses.classification_loss(logits, labels, 9.0)
                    return d + c

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (_, _), ls = jax.lax.scan(body, (params, opt), jnp.arange(iters))
            return jnp.sum(ls)

        a = (params, opt, frames, teacher, labels)
        float(timed(*a))  # compile + warm
        best = _best_of(lambda: float(timed(*a)), n=5)
        ms = best / iters * 1e3
        results[head_proj] = ms
        print(f"{head_proj}: {ms:.2f} ms/step  {b * t * iters / best:,.0f} frames/s")
    for tag in ("fused", "fused_qkv"):
        print(f"{tag} vs split: {results['split'] / results[tag]:.4f}x")


def run_extraction(args) -> None:
    """Same A/B on the extraction geometry (ViT-B/16 b128 bf16 forward,
    bench.py's exact recipe/harness)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder

    print("backend:", jax.default_backend(), jax.devices())
    batch, iters = EXTRACTION_RECIPE["batch"], EXTRACTION_RECIPE["iters"]
    frames = _make_frames(batch)
    base_cfg = ClipVisionConfig.vit_b_16()
    params = ClipVisionEncoder(base_cfg).init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]
    dev_frames = jax.device_put(jnp.asarray(frames))
    results = {}
    for head_proj in ("split", "fused", "fused_qkv"):
        cfg = dataclasses.replace(base_cfg, head_proj=head_proj)
        enc = ClipVisionEncoder(cfg, dtype=jnp.bfloat16)
        timed = make_extraction_timed(enc, cfg.image_size, iters)
        float(timed(params, dev_frames))  # compile + warm
        best = _best_of(lambda: float(timed(params, dev_frames)), n=5)
        ms = best / iters * 1e3
        fps = batch * iters / best
        results[head_proj] = ms
        print(f"{head_proj}: {ms:.2f} ms/batch{batch}  {fps:,.0f} frames/s")
    for tag in ("fused", "fused_qkv"):
        print(f"{tag} vs split: {results['split'] / results[tag]:.4f}x")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=TFAM_RECIPE["iters"])
    p.add_argument("--impl", default="auto", choices=["auto", "xla", "flash"])
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--target", default="tfam",
                   choices=["tfam", "extraction", "student"])
    args = p.parse_args()

    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    if args.target == "extraction":
        run_extraction(args)
        return
    if args.target == "student":
        run_student(args)
        return
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

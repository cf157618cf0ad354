#!/usr/bin/env python
"""Profile a bench.py device path and attribute its step time by op class.

Captures a jax.profiler trace (perfetto JSON — works through the axon
tunnel on this rig) of the exact bench.py recipe for one of the three
device paths, then rolls DEVICE LEAF op slices up by XLA's own
`hlo_category` so the gap to the measured ~193 TFLOP/s matmul ceiling is
attributed by measurement instead of arithmetic (docs/PERF.md):

  --target tfam        stage-2 train step (b8, t512, d512 x 4 cross-attn
                       layers, bf16, dropout 0.1, flash + fused dropout)
  --target extraction  teacher CLIP ViT-B/16 forward incl. fused
                       preprocess (b128, bf16) — the headline metric
  --target student     stage-1 distillation train step (ViT-B/32, b8 x 29
                       frames @ 360x640, bf16)

Usage: python tools/profile_step.py --target extraction [--out DIR]
Prints a JSON summary; the raw trace stays in --out for TensorBoard.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

# the recipe constants come from bench.py itself so the profiled program
# cannot drift from the benchmarked one (review r3)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import EXTRACTION_RECIPE, STUDENT_RECIPE, TFAM_RECIPE  # noqa: E402


def build_tfam(head_proj="split"):
    """The bench.py TFAM recipe step (match: AMO_CLIP.py:6-51 shapes,
    cfg_AK/config_default.yaml recipe). ``head_proj`` switches the MHA
    projection scheduling (ops/attention.py) for the A/B trace."""
    import jax
    import jax.numpy as jnp
    import optax

    from vimoclip_tpu import losses
    from vimoclip_tpu.config import TFAMModelConfig
    from vimoclip_tpu.models import TFAM

    r = TFAM_RECIPE
    b, t, d, layers, ff, classes = (
        r["b"], r["t"], r["d"], r["layers"], r["ff"], r["classes"]
    )
    model = TFAM(
        config=TFAMModelConfig(d_model=d, nhead=8, num_layers=layers,
                               dim_feedforward=ff, attention_impl="auto",
                               head_proj=head_proj),
        num_classes=classes, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    motion = jnp.asarray(rng.normal(size=(b, t - 1, d)).astype(np.float32))
    mr, mf = jnp.ones((b, t), bool), jnp.ones((b, t - 1), bool)
    labels = jnp.asarray((rng.random((b, classes)) < 0.05).astype(np.float32))
    params = model.init(jax.random.key(0), rgb, motion, mr, mf)["params"]
    tx = optax.adamw(1e-4, weight_decay=0.1)
    opt = tx.init(params)

    iters = r["iters"]

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
    return timed, (params, opt, key, rgb, motion, mr, mf, labels), iters


def build_extraction():
    """The bench.py teacher-extraction forward (extract_embeddings.py:17
    model at the reference's 224 geometry, fused on-device preprocess)."""
    import cv2
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
    from vimoclip_tpu.ops.preprocess import clip_preprocess

    cfg = ClipVisionConfig.vit_b_16()
    enc = ClipVisionEncoder(cfg, dtype=jnp.bfloat16)
    batch, iters = EXTRACTION_RECIPE["batch"], EXTRACTION_RECIPE["iters"]
    rng = np.random.default_rng(0)
    low = rng.integers(0, 256, (batch, 15, 20, 3), dtype=np.uint8)
    frames = np.stack([cv2.resize(f, (640, 360)) for f in low])
    params = enc.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]

    @jax.jit
    def timed(params, raw):
        def body(carry, i):
            pixels = clip_preprocess(
                raw.at[0, 0, 0, 0].set(i), cfg.image_size, dtype=jnp.bfloat16
            )
            emb = enc.apply({"params": params}, pixels)
            return carry + jnp.sum(emb.astype(jnp.float32)), None

        total, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(iters, dtype=jnp.uint8)
        )
        return total

    dev = jax.device_put(jnp.asarray(frames))
    return timed, (params, dev), iters


def build_student():
    """The bench.py stage-1 distillation train step (train.py recipe at the
    shipped b8 default)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vimoclip_tpu import losses
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig
    from vimoclip_tpu.models.student import StudentModel

    r = STUDENT_RECIPE
    b, t, h, w, classes = r["b"], r["t"], r["h"], r["w"], r["classes"]
    iters = r["iters"]
    cfg = ClipVisionConfig.vit_b_32()
    model = StudentModel(vision_config=cfg, num_classes=classes,
                         dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (b, t, h, w, 3), dtype=np.uint8))
    teacher = jnp.asarray(rng.normal(size=(b, t, 512)).astype(np.float32))
    labels = jnp.asarray((rng.random((b, classes)) < 0.05).astype(np.float32))
    params = model.init(jax.random.key(0), frames)["params"]
    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def timed(params, opt, frames, teacher, labels):
        def body(carry, i):
            p, o = carry
            # match bench.py: perturb one pixel so the params-independent
            # preprocess can't be hoisted out of the scan
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

    return timed, (params, opt, frames, teacher, labels), iters


BUILDERS = {
    "tfam": build_tfam,
    "extraction": build_extraction,
    "student": build_student,
}


def analyze_perfetto(trace_path: str):
    """Roll device op slices up by XLA's own `hlo_category` (present in the
    args of every leaf op slice in jax's perfetto export — e.g.
    'convolution fusion' = matmul fusions, 'custom-call' = Pallas kernels,
    'loop fusion' = pure elementwise chains, 'data formatting' = copies/
    transposes). Slices WITHOUT an hlo_category (the enclosing `while`,
    step and module spans) are parents that would double-count their
    children, so they are excluded from the totals; the leaf sum matches
    the jit_<fn> module span to <1% (validated on this rig, round 3)."""
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    by_cat = collections.Counter()
    by_op = collections.Counter()
    module_ms = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        args = e.get("args") or {}
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        if name.startswith("jit_"):
            module_ms += dur
            continue
        cat = args.get("hlo_category")
        if not cat:
            continue
        by_cat[cat] += dur
        # group ops by name stem so e.g. per-site flash calls roll up
        by_op[name.rsplit(".", 1)[0] + " | " + cat] += dur
    return by_cat, by_op, module_ms


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", choices=sorted(BUILDERS), default="tfam")
    ap.add_argument("--out", default=None)
    ap.add_argument("--head-proj", default="split", choices=["split", "fused"],
                    help="tfam only: MHA projection scheduling A/B")
    args = ap.parse_args(argv)
    out = args.out or f"/tmp/profile_{args.target}"

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/vimo_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    builder = BUILDERS[args.target]
    timed, fn_args, iters = (
        builder(head_proj=args.head_proj) if args.target == "tfam" else builder()
    )
    float(timed(*fn_args))  # compile + warm
    t0 = time.perf_counter()
    float(timed(*fn_args))
    wall = time.perf_counter() - t0

    os.makedirs(out, exist_ok=True)
    with jax.profiler.trace(out, create_perfetto_trace=True):
        float(timed(*fn_args))

    traces = sorted(
        glob.glob(os.path.join(out, "**", "perfetto_trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    summary = {
        "target": args.target,
        "step_ms_wall": round(wall / iters * 1e3, 3),
        "iters_per_call": iters,
        "device": str(jax.devices()[0]),
        "trace_dir": out,
    }
    if traces:
        by_cat, by_op, module_ms = analyze_perfetto(traces[-1])
        dev_total = sum(by_cat.values())
        summary["device_total_ms"] = round(dev_total, 3)
        summary["device_ms_per_step"] = round(dev_total / iters, 3)
        summary["module_span_ms"] = round(module_ms, 3)
        summary["by_category_ms_per_step"] = {
            k: round(v / iters, 3) for k, v in by_cat.most_common()
        }
        summary["top_op_groups_ms_per_step"] = {
            k[:120]: round(v / iters, 3) for k, v in by_op.most_common(20)
        }
    else:
        summary["error"] = "no perfetto trace produced"
    print(json.dumps(summary, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

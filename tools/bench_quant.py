"""A/B: dynamic-int8 vs bf16 extraction forward on the real chip.

Same tunnel-proof methodology as bench.py (N iterations inside one jit
call, per-iteration pixel perturbation against hoisting, scalar fetch,
best-of-5). Also reports on-device embedding fidelity (cosine vs the bf16
path) on the same random-init ViT-B/16 — the quality side of the trade.

Usage: python tools/bench_quant.py [--batch 128] [--iters 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import (  # noqa: E402
    EXTRACTION_RECIPE,
    _best_of,
    _make_frames,
    make_extraction_timed,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=EXTRACTION_RECIPE["batch"])
    p.add_argument("--iters", type=int, default=EXTRACTION_RECIPE["iters"])
    args = p.parse_args()

    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
    from vimoclip_tpu.ops.preprocess import clip_preprocess

    print("backend:", jax.default_backend(), jax.devices())

    frames = _make_frames(args.batch)  # bench.py's exact frame recipe
    base_cfg = ClipVisionConfig.vit_b_16()
    params = ClipVisionEncoder(base_cfg).init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]
    dev_frames = jax.device_put(jnp.asarray(frames))

    results = {}
    embeds = {}
    for tag, quant in (("bf16", None), ("int8", "int8")):
        cfg = dataclasses.replace(base_cfg, matmul_quant=quant)
        enc = ClipVisionEncoder(cfg, dtype=jnp.bfloat16)

        def one_batch(params, raw):
            pixels = clip_preprocess(raw, cfg.image_size, dtype=jnp.bfloat16)
            return enc.apply({"params": params}, pixels)

        # bench.py's exact anti-hoist harness (single copy of the
        # methodology — ADVICE r3 #4)
        timed = make_extraction_timed(enc, cfg.image_size, args.iters)
        float(timed(params, dev_frames))  # compile + warm
        best = _best_of(lambda: float(timed(params, dev_frames)), n=5)
        ms = best / args.iters * 1e3
        fps = args.batch * args.iters / best
        results[tag] = (ms, fps)
        print(f"{tag}: {ms:.2f} ms/batch{args.batch}  {fps:,.0f} frames/s")

        embeds[tag] = np.asarray(
            jax.jit(one_batch)(params, dev_frames), np.float64
        )

    a, b = embeds["bf16"], embeds["int8"]
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    print(
        f"speedup: {results['bf16'][0] / results['int8'][0]:.3f}x   "
        f"cosine(int8, bf16): min {cos.min():.5f} mean {cos.mean():.5f}"
    )


if __name__ == "__main__":
    main()

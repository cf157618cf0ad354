"""A/B: ToMe token merging (and its combination with int8) on the real chip.

Same tunnel-proof methodology as bench.py / tools/bench_quant.py (shared
EXTRACTION_RECIPE); reports throughput + embedding cosine vs the exact
bf16 forward for each variant.

Usage: python tools/bench_tome.py [--r 8 16] [--with-int8]
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
    p.add_argument("--r", type=int, nargs="*", default=[8, 16])
    p.add_argument("--with-int8", action="store_true")
    p.add_argument("--model", choices=["b16", "b32"], default="b16",
                   help="b16 = teacher geometry (197 tokens), "
                        "b32 = student geometry (50 tokens)")
    args = p.parse_args()

    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
    from vimoclip_tpu.ops.preprocess import clip_preprocess

    print("backend:", jax.default_backend(), jax.devices())
    batch, iters = EXTRACTION_RECIPE["batch"], EXTRACTION_RECIPE["iters"]
    frames = _make_frames(batch)  # bench.py's exact frame recipe
    base_cfg = (
        ClipVisionConfig.vit_b_16() if args.model == "b16"
        else ClipVisionConfig.vit_b_32()
    )
    params = ClipVisionEncoder(base_cfg).init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]
    dev_frames = jax.device_put(jnp.asarray(frames))

    variants = [("bf16", {})]
    for r in args.r:
        variants.append((f"tome{r}", {"token_merge_r": r}))
        if args.with_int8:
            variants.append(
                (f"tome{r}+int8", {"token_merge_r": r, "matmul_quant": "int8"})
            )

    ref_emb = None
    base_ms = None
    for tag, overrides in variants:
        cfg = dataclasses.replace(base_cfg, **overrides)
        enc = ClipVisionEncoder(cfg, dtype=jnp.bfloat16)

        def one_batch(params, raw):
            pixels = clip_preprocess(raw, cfg.image_size, dtype=jnp.bfloat16)
            return enc.apply({"params": params}, pixels)

        # bench.py's exact anti-hoist harness (single copy of the
        # methodology — ADVICE r3 #4)
        timed = make_extraction_timed(enc, cfg.image_size, iters)
        float(timed(params, dev_frames))  # compile + warm
        best = _best_of(lambda: float(timed(params, dev_frames)), n=5)
        ms = best / iters * 1e3
        fps = batch * iters / best
        emb = np.asarray(jax.jit(one_batch)(params, dev_frames), np.float64)
        if ref_emb is None:
            ref_emb, base_ms = emb, ms
            cos_txt = "(reference)"
        else:
            cos = (ref_emb * emb).sum(-1) / (
                np.linalg.norm(ref_emb, axis=-1) * np.linalg.norm(emb, axis=-1)
            )
            cos_txt = (
                f"cos min {cos.min():.4f} mean {cos.mean():.4f} "
                f"speedup {base_ms / ms:.3f}x"
            )
        print(f"{tag:12s} {ms:6.2f} ms/b{batch}  {fps:8,.0f} frames/s  {cos_txt}")


if __name__ == "__main__":
    main()

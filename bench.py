"""Benchmark: CLIP ViT-B/16 frame-embedding extraction throughput per chip —
the reference pipeline's throughput-critical path (extract_embeddings.py hot
loop, SURVEY.md §3.1).

Measures the TPU-native path (on-device fused preprocess + batched jit ViT
forward in bf16) on synthetic AK-geometry frames (640x360 uint8), vs a
reference-style baseline measured on the same machine: per-frame host PIL
preprocessing (HF CLIPImageProcessor — exactly extract_embeddings.py:89-93)
feeding the same device model, serialized like the reference loop.

Timing methodology (tunnel-proof): on this rig the TPU is reached through a
tunnel where ``block_until_ready`` does not block and large fetches run at
~17 MB/s, so naive timing is wrong in both directions. The benchmark keeps
inputs device-resident, runs ITERS forwards inside ONE jit call via
``lax.scan``, reduces the output to a scalar, and fetches that scalar
(best-of-3). This times exactly what production extraction runs per batch.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _make_frames(n: int, h=360, w=640, seed=0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    low = rng.integers(0, 256, (n, h // 24, w // 32, 3), dtype=np.uint8)
    import cv2

    return np.stack(
        [cv2.resize(f, (w, h), interpolation=cv2.INTER_LINEAR) for f in low]
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
    from vimoclip_tpu.ops.preprocess import clip_preprocess

    cfg = ClipVisionConfig.vit_b_16()  # AK teacher (extract_embeddings.py:17)
    enc = ClipVisionEncoder(cfg, dtype=jnp.bfloat16)

    batch, iters = 128, 8
    frames = _make_frames(batch)
    params = enc.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )["params"]

    def one_batch(params, raw):
        pixels = clip_preprocess(raw, cfg.image_size, dtype=jnp.bfloat16)
        return enc.apply({"params": params}, pixels)

    @jax.jit
    def timed(params, raw):
        # The body must depend on the iteration index — with identical
        # inputs every step XLA hoists the whole forward out of the scan and
        # the "benchmark" measures one batch (observed: impossible 29k
        # frames/s). Perturbing one pixel per step defeats the hoisting at
        # one input-copy per iteration (~0.2 ms). (Scanning over a stack of
        # distinct batches would be cleaner, but this rig's remote-compile
        # service rejects programs that large with HTTP 413.)
        def body(carry, i):
            emb = one_batch(params, raw.at[0, 0, 0, 0].set(i))
            return carry + jnp.sum(emb.astype(jnp.float32)), None

        total, _ = jax.lax.scan(
            body, jnp.float32(0), jnp.arange(iters, dtype=jnp.uint8)
        )
        return total

    dev_frames = jax.device_put(jnp.asarray(frames))
    float(timed(params, dev_frames))  # compile + warm
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(timed(params, dev_frames))  # scalar fetch = true sync
        times.append(time.perf_counter() - t0)
    tpu_fps = batch * iters / min(times)

    # Reference-style baseline on the same machine: serial per-frame PIL
    # preprocessing (the reference's hot-loop structure) + device forward.
    n_base = 64
    try:
        from transformers import CLIPImageProcessor

        proc = CLIPImageProcessor(crop_size=224, size={"shortest_edge": 224})

        @jax.jit
        def fwd_sum(p, x):
            return jnp.sum(enc.apply({"params": p}, x).astype(jnp.float32))

        warm = jnp.zeros((n_base, 224, 224, 3), jnp.float32)
        float(fwd_sum(params, warm))
        t0 = time.perf_counter()
        pixels = proc(images=list(frames[:n_base]), return_tensors="np")[
            "pixel_values"
        ].transpose(0, 2, 3, 1)
        float(fwd_sum(params, jnp.asarray(pixels)))
        ref_fps = n_base / (time.perf_counter() - t0)
    except Exception:
        ref_fps = float("nan")

    result = {
        "metric": "clip_vit_b16_extraction_throughput",
        "value": round(tpu_fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(tpu_fps / ref_fps, 2) if np.isfinite(ref_fps) else None,
        "detail": {
            "baseline_ref_style_fps_same_host": round(ref_fps, 1)
            if np.isfinite(ref_fps)
            else None,
            "batch": batch,
            "iters_per_call": iters,
            "dtype": "bfloat16",
            "device": str(jax.devices()[0]),
            "note": "baseline = reference hot-loop structure (serial PIL "
                    "preprocess + device forward) on this host; reference "
                    "publishes no throughput numbers (BASELINE.md)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())

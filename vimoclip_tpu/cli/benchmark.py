"""Motion-modality + pipeline benchmark — the surface of the reference's
``utils/video_benchmark_raft.py`` (SURVEY.md #23): compares motion
generators (frame-diff vs Farnebäck vs RAFT/ptlflow via ``--flow-backend
raft --flow-weights ...``) on N sample videos with wall time, fps, host-RSS
peak, per-backend peak accelerator memory (video_benchmark_raft.py:269-279),
and output statistics, plus TPU-side throughput of the extraction forward
and the TFAM fusion step. JSON report + console table."""

from __future__ import annotations

import argparse
import json
import os
import random
import time

import numpy as np

from vimoclip_tpu.utils.logging import setup_logging
from vimoclip_tpu.utils.profiling import MemoryMonitor, device_memory_stats


def _torch_cuda_peak_tracker():
    """(reset_fn, peak_mb_fn) for torch CUDA backends — the reference
    reports ``torch.cuda.max_memory_allocated`` per flow backend
    (video_benchmark_raft.py:269-279). Null-safe when CUDA is absent
    (ptlflow on CPU, or torch not importable)."""
    try:
        import torch

        if torch.cuda.is_available():
            return torch.cuda.reset_peak_memory_stats, (
                lambda: torch.cuda.max_memory_allocated() / 1e6
            )
    except Exception:
        pass
    return (lambda: None), (lambda: None)


def _bench_motion(videos: list[str], kind: str, tmp_dir: str, flow_fn=None) -> dict:
    """One benchmark arm. ``kind``: 'frame_diff' | 'flow' (Farnebäck) |
    'raft' (any ptlflow-interface backend passed as ``flow_fn``)."""
    import functools

    from vimoclip_tpu.data.video_reader import read_video
    from vimoclip_tpu.motion import (
        farneback_flow,
        generate_frame_diff_video,
        generate_optical_flow_video,
    )

    if kind == "frame_diff":
        gen = generate_frame_diff_video
    else:
        gen = functools.partial(
            generate_optical_flow_video, flow_fn=flow_fn or farneback_flow
        )
    reset_peak, peak_mb = _torch_cuda_peak_tracker()
    reset_peak()
    frames_total, t_total, stats = 0, 0.0, []
    with MemoryMonitor() as mem:
        for i, src in enumerate(videos):
            dst = os.path.join(tmp_dir, f"{kind}_{i}.mp4")
            t0 = time.perf_counter()
            n = gen(src, dst)
            t_total += time.perf_counter() - t0
            frames_total += n
            out = read_video(dst, max_frames=16).astype(np.float32)
            stats.append({"mean": float(out.mean()), "std": float(out.std()),
                          "nonzero_frac": float((out > 8).mean())})
    device_peak = peak_mb()
    return {
        "kind": kind,
        "videos": len(videos),
        "frames": frames_total,
        "wall_s": round(t_total, 3),
        "fps": round(frames_total / t_total, 1) if t_total else None,
        "peak_rss_mb": round(mem.peak_mb, 1),
        "peak_device_mb": round(device_peak, 1) if device_peak else None,
        "output_stats": {
            k: round(float(np.mean([s[k] for s in stats])), 4) for k in stats[0]
        } if stats else {},
    }


def _timed_scalar_call(fn, *args, reps: int = 3) -> float:
    """best-of-N wall time of a scalar-returning jit call (tunnel-proof
    sync; see bench.py docstring)."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _bench_tpu(batch: int, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.config import TFAMModelConfig
    from vimoclip_tpu.models import TFAM
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
    from vimoclip_tpu.ops.preprocess import clip_preprocess

    rng = np.random.default_rng(0)
    out = {"device": str(jax.devices()[0])}

    # extraction forward (preprocess + ViT-B/16, bf16)
    cfg = ClipVisionConfig.vit_b_16()
    enc = ClipVisionEncoder(cfg, dtype=jnp.bfloat16)
    frames = jnp.asarray(rng.integers(0, 256, (batch, 360, 640, 3), dtype=np.uint8))
    params = enc.init(jax.random.key(0), jnp.zeros((1, 224, 224, 3)))["params"]

    @jax.jit
    def extract(params, raw):
        # iteration-dependent input defeats XLA's loop-invariant hoisting
        # (see bench.py)
        def body(c, i):
            emb = enc.apply({"params": params},
                            clip_preprocess(raw.at[0, 0, 0, 0].set(i), 224,
                                            dtype=jnp.bfloat16))
            return c + jnp.sum(emb.astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(iters, dtype=jnp.uint8))[0]

    float(extract(params, frames))  # compile
    dt = _timed_scalar_call(extract, params, frames)
    out["extract_frames_per_s"] = round(batch * iters / dt, 1)

    # TFAM fusion forward (full-size, 450-frame clips)
    tf_cfg = TFAMModelConfig()
    model = TFAM(config=tf_cfg, num_classes=140)
    b, t = 8, 450
    rgb = jnp.asarray(rng.normal(size=(b, t, 512)).astype(np.float32))
    mot = jnp.asarray(rng.normal(size=(b, t - 1, 512)).astype(np.float32))
    mr, mf = jnp.ones((b, t), bool), jnp.ones((b, t - 1), bool)
    tparams = model.init(jax.random.key(1), rgb, mot, mr, mf)["params"]

    @jax.jit
    def fuse(p, rgb, mot, mr, mf):
        def body(c, i):
            logits = model.apply({"params": p}, rgb.at[0, 0, 0].set(i),
                                 mot, mr, mf, deterministic=True)
            return c + jnp.sum(logits), None
        return jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(iters, dtype=jnp.float32))[0]

    float(fuse(tparams, rgb, mot, mr, mf))
    dt = _timed_scalar_call(fuse, tparams, rgb, mot, mr, mf)
    out["tfam_clips_per_s"] = round(b * iters / dt, 1)
    out["device_memory"] = device_memory_stats()
    return out


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description="ViMoCLIP pipeline benchmark")
    p.add_argument("--videos-dir", default=None,
                   help="sample RGB videos for the motion-generator benchmark")
    p.add_argument("--num-videos", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--skip-tpu", action="store_true")
    p.add_argument("--skip-flow", action="store_true",
                   help="skip the (slow) Farneback benchmark")
    p.add_argument("--flow-backend", choices=["farneback", "raft"],
                   default="farneback",
                   help="optical-flow arm: in-repo Farneback, or any "
                        "ptlflow-interface model (the reference's "
                        "video_benchmark_raft.py benches RAFT)")
    p.add_argument("--flow-weights", default=None,
                   help="raft backend: ptlflow ckpt name/path, or a "
                        "serialized torch module file when ptlflow is absent")
    p.add_argument("--flow-model", default="raft",
                   help="ptlflow architecture name (raft, gma, ...)")
    p.add_argument("--flow-device", default="cpu",
                   help="torch device for the learned flow backend")
    p.add_argument("--output", default="benchmark_results.json")
    args = p.parse_args(argv)

    setup_logging()
    from vimoclip_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    report: dict = {"timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}

    if args.videos_dir:
        import glob as g
        import tempfile

        videos = sorted(g.glob(os.path.join(args.videos_dir, "*.mp4")))
        random.Random(args.seed).shuffle(videos)
        videos = videos[: args.num_videos]
        tmp = tempfile.mkdtemp(prefix="vimo_bench_")
        report["frame_diff"] = _bench_motion(videos, "frame_diff", tmp)
        if not args.skip_flow:
            if args.flow_backend == "raft":
                from vimoclip_tpu.motion import load_flow_backend

                flow_fn = load_flow_backend(
                    "raft", weights=args.flow_weights,
                    model_name=args.flow_model, device=args.flow_device,
                )
                report["raft"] = _bench_motion(videos, "raft", tmp, flow_fn)
            else:
                report["optical_flow"] = _bench_motion(videos, "flow", tmp)

    if not args.skip_tpu:
        report["tpu"] = _bench_tpu(args.batch, args.iters)

    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    try:
        from tabulate import tabulate

        rows = []
        for k, v in report.items():
            if isinstance(v, dict):
                for kk, vv in v.items():
                    if isinstance(vv, (int, float, str)):
                        rows.append([k, kk, vv])
        print(tabulate(rows, headers=["section", "metric", "value"], tablefmt="pretty"))
    except ImportError:
        print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

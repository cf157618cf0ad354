#!/usr/bin/env python
"""Measure video-decode throughput per CPU core (VERDICT r2 item 7).

SCALING.md sizes the extraction data plane ("~N CPU cores per chip") — this
script replaces the arithmetic estimate with a measurement. On this rig the
host has ONE core, which is exactly the per-core measurement we need; both
backends decode the same synthetic H.264 corpus:

- native DecodePool (C++ libav, workers=1) — the production corpus path;
- the OpenCV per-video reader (data.video_reader.read_video) — the default
  backend.

Usage: python tools/bench_decode.py [--height 360 --width 640 --frames 300
--videos 4]. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time

import numpy as np


def make_corpus(root: str, n_videos: int, frames: int, h: int, w: int):
    """Noise-over-moving-gradient H.264 clips: incompressible enough that
    the decoder does real work (pure noise inflates bitrate; pure gradient
    decodes trivially)."""
    from vimoclip_tpu.data.video_reader import write_video

    rng = np.random.default_rng(0)
    paths = []
    yy = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
    for i in range(n_videos):
        base = rng.integers(0, 64, (frames, h, w, 3)).astype(np.float32)
        phase = (np.arange(frames, dtype=np.float32) * 3)[:, None, None, None]
        vid = np.clip(base + (yy + phase) % 192, 0, 255).astype(np.uint8)
        p = os.path.join(root, f"v{i}.mp4")
        write_video(p, vid)
        paths.append(p)
    return paths


def bench_native_pool(paths: list[str], workers: int) -> float:
    from vimoclip_tpu.data.native import DecodePool

    t0 = time.perf_counter()
    n = 0
    with DecodePool(workers=workers, chunk_frames=128) as pool:
        for i, p in enumerate(paths):
            pool.submit(f"v{i}", p)
        pool.seal()
        for _, frames, _, err in pool:
            assert err is None, err
            n += len(frames)
    return n / (time.perf_counter() - t0)


def bench_opencv(paths: list[str]) -> float:
    from vimoclip_tpu.data.video_reader import read_video

    t0 = time.perf_counter()
    n = sum(len(read_video(p)) for p in paths)
    return n / (time.perf_counter() - t0)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--workers", type=int, default=1,
                    help="pool workers (1 == per-core number on a 1-core host)")
    args = ap.parse_args(argv)

    os.environ.setdefault("VIMO_NATIVE_DECODE", "1")
    with tempfile.TemporaryDirectory() as td:
        paths = make_corpus(td, args.videos, args.frames, args.height,
                            args.width)
        native = opencv = None
        try:
            # warm + best-of-2 (page cache, codec init)
            bench_native_pool(paths, args.workers)
            native = max(bench_native_pool(paths, args.workers)
                         for _ in range(2))
        except RuntimeError as e:
            native = f"unavailable: {e}"
        bench_opencv(paths)
        opencv = max(bench_opencv(paths) for _ in range(2))

    out = {
        "geometry": f"{args.videos}x{args.frames}f @ {args.height}x{args.width} h264",
        "host_cores": os.cpu_count(),
        "pool_workers": args.workers,
        "native_pool_frames_per_s": round(native, 1)
        if isinstance(native, float) else native,
        "opencv_frames_per_s": round(opencv, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

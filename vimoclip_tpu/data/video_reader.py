"""Host-side video decode.

The reference pulls in three native decoders: decord for batched teacher
extraction (extract_embeddings.py:73-84), torchvision/PyAV ``read_video`` for
whole-video stage-1 loading (dataset.py:98) and ``VideoReader``+seek for
exact-window streaming (dataset_frame_diff_mn.py:57-80,
inference_frame_diff.py:183-227). Here a single decoder interface serves all
three access patterns, backed by:

- the C++ libav data plane (``vimoclip_tpu.data.native``) when built — a
  multi-threaded FFmpeg decoder that fills a preallocated uint8 ring buffer;
- OpenCV ``cv2.VideoCapture`` otherwise (always available in the image).

All outputs are RGB uint8 NHWC numpy — the layout the on-device
preprocessing ops consume directly.
"""

from __future__ import annotations

import os
from typing import Iterator

import cv2
import numpy as np


def _native_backend():
    """The C++ libav backend, when built AND opted in.

    Opt-in (VIMO_NATIVE_DECODE=1) rather than default: on many-core hosts
    its decode+convert pool wins, but OpenCV's SIMD YUV->RGB is ~3x faster
    per core than swscale, so on small hosts (this dev box has 1 core)
    OpenCV is the better default. Both produce bit-identical frames
    (tests/test_native_dataplane.py).
    """
    if os.environ.get("VIMO_NATIVE_DECODE", "0") != "1":
        return None
    try:
        from vimoclip_tpu.data import native

        return native if native.available() else None
    except Exception:
        return None


def video_frame_count(path: str) -> int:
    cap = cv2.VideoCapture(path)
    try:
        n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    finally:
        cap.release()
    return max(n, 0)


def read_video(path: str, max_frames: int | None = None) -> np.ndarray:
    """Decode a whole video -> (T, H, W, 3) RGB uint8.

    Equivalent of torchvision ``io.read_video`` as used at dataset.py:98 and
    inference.py:50-64 (which decodes everything then slices).
    """
    native = _native_backend()
    if native is not None:
        return native.read_video(path, max_frames=max_frames)
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"could not open video {path}")
    frames = []
    try:
        while max_frames is None or len(frames) < max_frames:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    finally:
        cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path}")
    return np.stack(frames)


def read_video_window(path: str, start: int, num_frames: int) -> np.ndarray:
    """Decode exactly ``[start, start+num_frames)`` -> (n, H, W, 3) RGB uint8
    (n <= num_frames near EOF).

    Equivalent of the MN dataset's seek-based exact-window decode
    (dataset_frame_diff_mn.py:57-80) without decoding the rest of the video.
    """
    native = _native_backend()
    if native is not None:
        return native.read_video_window(path, start, num_frames)
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"could not open video {path}")
    try:
        if start > 0:
            cap.set(cv2.CAP_PROP_POS_FRAMES, start)
        frames = []
        while len(frames) < num_frames:
            ok, frame = cap.read()
            if not ok:
                break
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    finally:
        cap.release()
    if not frames:
        raise IOError(f"no frames decoded from {path} at {start}")
    return np.stack(frames)


def iter_video_chunks(path: str, chunk_size: int = 64) -> Iterator[np.ndarray]:
    """Stream a video in bounded-memory chunks of (<=chunk_size, H, W, 3) —
    the exporter's access pattern (inference_frame_diff.py:183-227)."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"could not open video {path}")
    try:
        chunk: list[np.ndarray] = []
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            chunk.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if len(chunk) == chunk_size:
                yield np.stack(chunk)
                chunk = []
        if chunk:
            yield np.stack(chunk)
    finally:
        cap.release()


def write_video(path: str, frames: np.ndarray, fps: float = 30.0, is_color: bool | None = None) -> None:
    """Encode (T, H, W, 3) RGB or (T, H, W) gray uint8 frames to mp4 — used
    by the offline motion generators (parity with utils/generate_*)."""
    gray = frames.ndim == 3
    if is_color is None:
        is_color = not gray
    h, w = frames.shape[1:3]
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h), isColor=is_color)
    if not out.isOpened():
        raise IOError(f"could not open video writer for {path}")
    try:
        for f in frames:
            out.write(f if gray else cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    finally:
        out.release()

"""Offline motion-modality generation (L1 of the reference's layer map).

- ``generate_frame_diff_video``: grayscale absdiff of consecutive frames ->
  single-channel video (parity with utils/generate_frame_diff_video.py:7-60).
  Runs the diff math on-device via vimoclip_tpu.ops.preprocess.frame_diff
  when a TPU is present (it is a trivial XLA op), else on host.
- ``generate_optical_flow_video``: Farnebäck dense flow -> HSV(angle, 255,
  minmax-normalised magnitude) -> BGR video (parity with
  utils/generate_of_videos.py:8-74). OpenCV host-side — flow generation is
  an offline preprocessing stage; the RAFT/ptlflow path used for the paper
  (README.md:81-162) stays pluggable via ``flow_fn``.
- ``process_video_list``: list-file driver matching both reference utils.
"""

from __future__ import annotations

import logging
import os
from typing import Callable

import cv2
import numpy as np


def generate_frame_diff_video(video_path: str, output_path: str, on_device: bool = True) -> int:
    """Write the frame-diff video for one input; returns frame count."""
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"could not open video {video_path}")
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    out = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height),
        isColor=False,
    )
    n = 0
    try:
        ok, prev = cap.read()
        if not ok:
            raise IOError(f"could not read first frame of {video_path}")
        if on_device:
            # batch frames and run the uint8 diff as one XLA op per chunk
            import jax.numpy as jnp

            from vimoclip_tpu.ops.preprocess import frame_diff

            chunk = [cv2.cvtColor(prev, cv2.COLOR_BGR2RGB)]
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                chunk.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
                if len(chunk) == 129:  # 128 diffs per device round-trip
                    diffs = np.asarray(
                        frame_diff(jnp.asarray(np.stack(chunk)), replicate_channels=False)
                    )
                    for d in diffs:
                        out.write(d)
                        n += 1
                    chunk = [chunk[-1]]
            if len(chunk) > 1:
                diffs = np.asarray(
                    frame_diff(jnp.asarray(np.stack(chunk)), replicate_channels=False)
                )
                for d in diffs:
                    out.write(d)
                    n += 1
        else:
            prev_gray = cv2.cvtColor(prev, cv2.COLOR_BGR2GRAY)
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
                out.write(cv2.absdiff(gray, prev_gray))
                prev_gray = gray
                n += 1
    finally:
        cap.release()
        out.release()
    return n


def farneback_flow(prev_gray: np.ndarray, gray: np.ndarray) -> np.ndarray:
    """Reference Farnebäck parameters (generate_of_videos.py:51)."""
    return cv2.calcOpticalFlowFarneback(prev_gray, gray, None, 0.5, 3, 15, 3, 5, 1.2, 0)


def flow_to_hsv_bgr(flow: np.ndarray) -> np.ndarray:
    """HSV(angle/2, 255, minmax magnitude) -> BGR (generate_of_videos.py:53-63)."""
    magnitude, angle = cv2.cartToPolar(flow[..., 0], flow[..., 1])
    hsv = np.zeros(flow.shape[:2] + (3,), dtype=np.uint8)
    hsv[..., 0] = (angle * 180 / np.pi / 2).astype(np.uint8)
    hsv[..., 1] = 255
    hsv[..., 2] = cv2.normalize(magnitude, None, 0, 255, cv2.NORM_MINMAX).astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2BGR)


def generate_optical_flow_video(
    video_path: str,
    output_path: str,
    flow_fn: Callable[[np.ndarray, np.ndarray], np.ndarray] = farneback_flow,
) -> int:
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"could not open video {video_path}")
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    out = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
    )
    n = 0
    try:
        ok, first = cap.read()
        if not ok:
            raise IOError(f"could not read first frame of {video_path}")
        prev_gray = cv2.cvtColor(first, cv2.COLOR_BGR2GRAY)
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            out.write(flow_to_hsv_bgr(flow_fn(prev_gray, gray)))
            prev_gray = gray
            n += 1
    finally:
        cap.release()
        out.release()
    return n


def process_video_list(
    list_file: str,
    input_dir: str,
    output_dir: str,
    kind: str = "frame_diff",
    skip_existing: bool = True,
) -> dict[str, str]:
    """Drive generation from a video-list file (one relative path per line,
    generate_frame_diff_video.py:63-93). Returns {video: error} failures."""
    os.makedirs(output_dir, exist_ok=True)
    errors: dict[str, str] = {}
    with open(list_file) as f:
        names = [l.strip() for l in f if l.strip()]
    for name in names:
        src = os.path.join(input_dir, name)
        dst = os.path.join(output_dir, name)
        os.makedirs(os.path.dirname(dst) or output_dir, exist_ok=True)
        if skip_existing and os.path.exists(dst):
            continue
        try:
            if kind == "frame_diff":
                generate_frame_diff_video(src, dst)
            else:
                generate_optical_flow_video(src, dst)
        except Exception as e:
            errors[name] = str(e)
            logging.warning("%s: %s", name, e)
    return errors

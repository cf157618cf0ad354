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


class PtlflowAdapter:
    """``flow_fn`` adapter for ptlflow-style torch optical-flow models — the
    integration point for the paper's RAFT flow (reference README.md:81-162).

    Contract (pinned by tests/test_motion_raft.py): the wrapped model is a
    torch module following ptlflow's inference interface —

    - input: ``{"images": float32 tensor (1, 2, 3, H', W')}``, two RGB
      frames scaled to [0, 1], H'/W' zero-padded (bottom/right) to a
      multiple of ``divisor`` (RAFT needs /8 geometry; mirrors
      ptlflow.utils.io_adapter.IOAdapter);
    - output: dict with ``"flows"`` of shape (1, 1, 2, H', W') in pixels.

    ``__call__(prev_bgr, curr_bgr) -> (H, W, 2) float32`` matches the
    ``flow_fn`` slot of :func:`generate_optical_flow_video`;
    ``wants_color=True`` makes the driver feed BGR frames instead of
    grayscale. Colorisation downstream uses this repo's HSV mapping
    (``flow_to_hsv_bgr``) for every backend — the README snippet's
    ptlflow ``flow_to_rgb`` is a different visualisation colour wheel, but
    the flow VALUES (this adapter's output) are the contract.
    """

    wants_color = True

    def __init__(self, model, device: str = "cpu", divisor: int = 8):
        import torch

        self._torch = torch
        self.device = device
        self.divisor = divisor
        self.model = model.eval().to(device)

    @classmethod
    def from_weights(
        cls,
        weights: str | None = None,
        model_name: str = "raft",
        device: str = "cpu",
        divisor: int = 8,
    ) -> "PtlflowAdapter":
        """Build from ptlflow (``model_name`` + ckpt name/path, exactly the
        README recipe) when ptlflow is installed, else from a fully
        serialized torch module file (``torch.save(model)`` /
        ``torch.jit.save``)."""
        import torch

        try:
            import ptlflow  # optional dependency — not in this image

            model = ptlflow.get_model(model_name, ckpt_path=weights)
        except ImportError:
            if not weights:
                raise
            try:
                model = torch.jit.load(weights, map_location="cpu")
            except Exception:
                model = torch.load(weights, map_location="cpu", weights_only=False)
            if not hasattr(model, "eval"):
                raise TypeError(
                    f"{weights} is not a serialized torch module; without "
                    "ptlflow installed, --flow-weights must hold a full "
                    "module (torch.save(model) or torch.jit.save)"
                )
        return cls(model, device=device, divisor=divisor)

    def __call__(self, prev_frame: np.ndarray, frame: np.ndarray) -> np.ndarray:
        torch = self._torch
        h, w = prev_frame.shape[:2]
        pair = np.stack([prev_frame[..., ::-1], frame[..., ::-1]])  # BGR -> RGB
        images = (
            torch.from_numpy(np.ascontiguousarray(pair))
            .permute(0, 3, 1, 2)
            .float()
            / 255.0
        )
        pad_h, pad_w = (-h) % self.divisor, (-w) % self.divisor
        if pad_h or pad_w:
            images = torch.nn.functional.pad(images, (0, pad_w, 0, pad_h))
        with torch.no_grad():
            preds = self.model({"images": images.unsqueeze(0).to(self.device)})
        flow = preds["flows"][0, 0].cpu().numpy().transpose(1, 2, 0)
        return np.ascontiguousarray(flow[:h, :w]).astype(np.float32)


def load_flow_backend(
    backend: str = "farneback",
    weights: str | None = None,
    device: str = "cpu",
    model_name: str = "raft",
    divisor: int = 8,
) -> Callable[[np.ndarray, np.ndarray], np.ndarray]:
    """Resolve a ``flow_fn`` by name: ``farneback`` (in-repo OpenCV) or
    ``raft`` (any ptlflow model via :class:`PtlflowAdapter` —
    ``model_name`` picks the ptlflow architecture when ptlflow is
    installed, e.g. ``gma``/``flowformer``; ``divisor`` its stride)."""
    if backend == "farneback":
        return farneback_flow
    if backend == "raft":
        return PtlflowAdapter.from_weights(
            weights=weights, model_name=model_name, device=device,
            divisor=divisor,
        )
    raise ValueError(f"unknown flow backend {backend!r}")


def generate_optical_flow_video(
    video_path: str,
    output_path: str,
    flow_fn: Callable[[np.ndarray, np.ndarray], np.ndarray] = farneback_flow,
) -> int:
    """``flow_fn(prev, curr) -> (H, W, 2)``; fed grayscale frames by default
    or BGR frames when it sets ``wants_color=True`` (learned backends)."""
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"could not open video {video_path}")
    width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    out = cv2.VideoWriter(
        output_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (width, height)
    )
    wants_color = bool(getattr(flow_fn, "wants_color", False))
    n = 0
    try:
        ok, first = cap.read()
        if not ok:
            raise IOError(f"could not read first frame of {video_path}")
        prev = first if wants_color else cv2.cvtColor(first, cv2.COLOR_BGR2GRAY)
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            cur = frame if wants_color else cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            out.write(flow_to_hsv_bgr(flow_fn(prev, cur)))
            prev = cur
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
    flow_fn: Callable[[np.ndarray, np.ndarray], np.ndarray] | None = None,
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
                generate_optical_flow_video(src, dst,
                                            flow_fn=flow_fn or farneback_flow)
        except Exception as e:
            errors[name] = str(e)
            logging.warning("%s: %s", name, e)
    return errors

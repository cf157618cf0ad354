"""Runtime fidelity probe for the approximate ("turbo") encoder options.

The opt-in accelerators — dynamic-int8 MXU matmuls (``--quantize int8``,
ops/quant.py) and static-shape ToMe token merging (``--token-merge R``,
ops/tome.py) — are pinned in docs/PERF.md only on RANDOM-INIT weights
(ledger 15/16: int8 cosine 0.9998, ToMe r16 0.984 at the teacher's
197-token geometry — but r>=8 already degrades to 0.95/0.92 at the
student's 50-token geometry). Real checkpoints can land anywhere near
those numbers, so every CLI that exposes the flags also exposes
``--verify-fidelity N``: before the long run starts, N frames sampled
from the actual input are pushed through BOTH the exact (parity) encoder
and the approximate one with the SAME weights, and the per-frame cosine
is reported — the user sees THEIR fidelity, not the random-init pin
(VERDICT r3 #5). Below ``--fidelity-threshold`` the run aborts, because
the reference's implicit contract is that exported embeddings are exact
(/root/reference/extract_embeddings.py:94 writes the model's own output,
no approximation knob exists there).
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np


class FidelityError(RuntimeError):
    """The approximate encoder fell below the requested cosine threshold."""


def sample_video_frames(video_path: str, n: int) -> np.ndarray:
    """Uniformly sample ``n`` frames from a video (fewer if it is shorter)."""
    from vimoclip_tpu.data.video_reader import read_video

    frames = read_video(video_path)
    if len(frames) == 0:
        raise ValueError(f"no frames decoded from {video_path}")
    idx = np.unique(np.linspace(0, len(frames) - 1, n).astype(int))
    return frames[idx]


def sample_motion_probe_frames(video_path: str, n: int) -> np.ndarray:
    """Uniformly sample ``n`` CONSECUTIVE-pair BT.601 absdiff frames.

    The fused predict/serve cascade feeds the student tower
    ``frame_diff(window)`` outputs (serving.py) — sparse, near-black
    frames whose dynamic int8 scales and ToMe merges behave nothing like
    RGB's — so the student probe must measure fidelity on THAT input
    distribution, not on raw RGB frames (the exporter probes a motion
    video directly and needs no conversion). Uses the same ``frame_diff``
    op the cascade runs, on sampled consecutive pairs.
    """
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.data.video_reader import read_video
    from vimoclip_tpu.ops.preprocess import frame_diff

    frames = read_video(video_path)
    if len(frames) < 2:
        raise ValueError(
            f"need >= 2 frames for a motion probe, got {len(frames)} "
            f"from {video_path}"
        )
    idx = np.unique(np.linspace(0, len(frames) - 2, n).astype(int))
    pairs = np.stack([frames[idx], frames[idx + 1]], axis=1)  # (n,2,H,W,3)
    return np.asarray(jax.vmap(frame_diff)(jnp.asarray(pairs))[:, 0])


def encoder_fidelity_probe(
    params: dict,
    approx_config,
    frames: np.ndarray,
    *,
    half_precision: bool = True,
) -> dict:
    """Cosine(exact, approximate) per frame, same params, same preprocess.

    Args:
        params: the encoder's param tree (the ViT tower itself).
        approx_config: a ClipVisionConfig CARRYING the approximations
            (matmul_quant / token_merge_r set); the exact twin is derived by
            clearing them.
        frames: (N, H, W, 3) uint8 probe frames.

    Returns:
        dict with ``cosine_min`` / ``cosine_mean`` / ``n_frames`` /
        ``config`` (a short human-readable tag of what was approximated).
    """
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.models.clip_vit import ClipVisionEncoder
    from vimoclip_tpu.ops.preprocess import clip_preprocess

    exact_config = dataclasses.replace(
        approx_config, matmul_quant=None, token_merge_r=0
    )
    if exact_config == approx_config:
        raise ValueError(
            "encoder_fidelity_probe called with no approximation active "
            "(matmul_quant is None and token_merge_r is 0)"
        )
    dtype = jnp.bfloat16 if half_precision else jnp.float32

    def run(config):
        enc = ClipVisionEncoder(config, dtype=dtype)

        @jax.jit
        def fwd(p, raw):
            pixels = clip_preprocess(raw, config.image_size, dtype=dtype)
            return enc.apply({"params": p}, pixels).astype(jnp.float32)

        return np.asarray(fwd(params, jnp.asarray(frames)), np.float64)

    exact = run(exact_config)
    approx = run(approx_config)
    denom = np.linalg.norm(exact, axis=-1) * np.linalg.norm(approx, axis=-1)
    cos = (exact * approx).sum(-1) / np.maximum(denom, 1e-12)
    tags = []
    if approx_config.matmul_quant:
        tags.append(approx_config.matmul_quant)
    if approx_config.token_merge_r:
        tags.append(f"tome{approx_config.token_merge_r}")
    return {
        "cosine_min": float(cos.min()),
        "cosine_mean": float(cos.mean()),
        "n_frames": int(len(frames)),
        "config": "+".join(tags),
    }


def check_encoder_fidelity(
    params: dict,
    approx_config,
    probe_video: str,
    n_frames: int,
    threshold: float,
    *,
    half_precision: bool = True,
    encoder_name: str = "encoder",
    frames: np.ndarray | None = None,
) -> dict:
    """CLI entry: sample, probe, log, and ABORT below ``threshold``.

    ``frames`` skips the sampling step (callers that decode themselves to
    separate decode faults from probe faults — cli/extract_embeddings.py).
    """
    if frames is None:
        frames = sample_video_frames(probe_video, n_frames)
    report = encoder_fidelity_probe(
        params, approx_config, frames, half_precision=half_precision
    )
    logging.info(
        "fidelity probe (%s, %s, %d frames from %s): cosine min %.4f "
        "mean %.4f (threshold %.3f)",
        encoder_name, report["config"], report["n_frames"], probe_video,
        report["cosine_min"], report["cosine_mean"], threshold,
    )
    if report["cosine_min"] < threshold:
        raise FidelityError(
            f"{encoder_name} with {report['config']} reached cosine "
            f"{report['cosine_min']:.4f} on {report['n_frames']} sampled "
            f"frames of {probe_video} — below --fidelity-threshold "
            f"{threshold}. Drop the approximation flags (the parity path "
            f"is exact) or lower the threshold if this fidelity is "
            f"acceptable for your use."
        )
    return report

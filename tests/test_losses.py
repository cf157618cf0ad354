"""Numerical-parity tests for vimoclip_tpu.losses against the reference's
torch formulas (reference losses.py, train_frame_diff_mn.py)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from vimoclip_tpu import losses


def _torch_distill(student, teacher, mode):
    # Transcription of /root/reference/losses.py:5-44 semantics.
    s, t = torch.from_numpy(student), torch.from_numpy(teacher)
    if mode == "mse":
        return F.mse_loss(s, t).item()
    eps = 1e-5
    sn = s.norm(dim=-1).clamp(min=eps)
    tn = t.norm(dim=-1).clamp(min=eps)
    cos = (s * t).sum(dim=-1) / (sn * tn)
    cos = cos.clamp(-1 + eps, 1 - eps)
    return (1 - cos).mean().item()


@pytest.mark.parametrize("mode", ["mse", "cosine"])
def test_distillation_loss_matches_torch(mode):
    rng = np.random.default_rng(0)
    s = rng.normal(size=(8, 10, 512)).astype(np.float32)
    t = rng.normal(size=(8, 10, 512)).astype(np.float32)
    ours = float(losses.distillation_loss(jnp.asarray(s), jnp.asarray(t), mode))
    ref = _torch_distill(s, t, mode)
    assert ours == pytest.approx(ref, rel=1e-5, abs=1e-5)


def test_distillation_cosine_zero_vector_safe():
    s = np.zeros((2, 3, 512), dtype=np.float32)
    t = np.ones((2, 3, 512), dtype=np.float32)
    out = float(losses.distillation_loss(jnp.asarray(s), jnp.asarray(t), "cosine"))
    assert np.isfinite(out)
    assert abs(out - _torch_distill(s, t, "cosine")) < 1e-6


def test_distillation_bad_mode():
    with pytest.raises(ValueError):
        losses.distillation_loss(jnp.zeros((1, 1, 4)), jnp.zeros((1, 1, 4)), "huber")


@pytest.mark.parametrize("positive_weight", [None, 9.0])
def test_classification_loss_matches_torch(positive_weight):
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 140)).astype(np.float32) * 3
    targets = (rng.random((8, 140)) < 0.05).astype(np.float32)

    ours = float(
        losses.classification_loss(
            jnp.asarray(logits), jnp.asarray(targets), positive_weight
        )
    )

    lt, tt = torch.from_numpy(logits), torch.from_numpy(targets)
    if positive_weight is not None:
        # reference losses.py:63 — elementwise (B, C) pos_weight = w*y + 1
        pw = torch.full((140,), positive_weight) * tt + 1
    else:
        pw = None
    ref = F.binary_cross_entropy_with_logits(lt, tt, pos_weight=pw).item()
    assert ours == pytest.approx(ref, rel=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.default_rng(2)
    logits = rng.normal(size=(16, 12)).astype(np.float32)
    onehot = np.eye(12, dtype=np.float32)[rng.integers(0, 12, size=16)]

    ours = float(losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(onehot)))
    ref = F.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(onehot).argmax(dim=1)
    ).item()
    assert ours == pytest.approx(ref, rel=1e-5, abs=1e-5)

    # integer-target form
    idx = onehot.argmax(axis=-1)
    ours_idx = float(
        losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(idx))
    )
    assert ours_idx == pytest.approx(ref, rel=1e-5, abs=1e-5)


def test_reconstruction_loss_reserved():
    with pytest.raises(NotImplementedError):
        losses.reconstruction_loss(jnp.zeros(3), jnp.zeros(3))

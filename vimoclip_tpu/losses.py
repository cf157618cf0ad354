"""Training objectives for the MoCLIP distillation stage and the TFAM fusion
stage, numerically matching the reference implementations.

Reference parity:
- ``distillation_loss``   <- /root/reference/losses.py:5-44
- ``classification_loss`` <- /root/reference/losses.py:47-67 (pos-weighted BCE)
- ``cross_entropy_loss``  <- /root/reference/train_frame_diff_mn.py:82,102
  (``nn.CrossEntropyLoss`` on ``labels.argmax(dim=1)``)
- ``bce_with_logits``     <- ``nn.BCEWithLogitsLoss`` used by the TFAM trainer
  (/root/reference/TFAM/train_and_eval.py:58)

All functions are pure, jit-compatible, and operate on float32 by default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Epsilon used by the reference for safe cosine similarity
# (/root/reference/losses.py:24).
_COSINE_EPS = 1e-5


def distillation_loss(
    student_embeddings: jax.Array,
    teacher_embeddings: jax.Array,
    mode: str = "mse",
) -> jax.Array:
    """Distillation loss between student and teacher embeddings.

    Args:
        student_embeddings: (..., T, D) student outputs.
        teacher_embeddings: (..., T, D) frozen-teacher targets.
        mode: ``"mse"`` or ``"cosine"``.

    ``cosine`` reproduces the reference's NaN-safe manual computation
    (/root/reference/losses.py:23-40): norms clamped to >= 1e-5, cosine
    similarity clamped to (-1+eps, 1-eps), loss = mean(1 - cos).
    """
    if mode == "mse":
        diff = student_embeddings - teacher_embeddings
        return jnp.mean(jnp.square(diff))
    if mode == "cosine":
        student_norm = jnp.clip(
            jnp.linalg.norm(student_embeddings, axis=-1), min=_COSINE_EPS
        )
        teacher_norm = jnp.clip(
            jnp.linalg.norm(teacher_embeddings, axis=-1), min=_COSINE_EPS
        )
        cosine_sim = jnp.sum(student_embeddings * teacher_embeddings, axis=-1) / (
            student_norm * teacher_norm
        )
        cosine_sim = jnp.clip(cosine_sim, -1.0 + _COSINE_EPS, 1.0 - _COSINE_EPS)
        return jnp.mean(1.0 - cosine_sim)
    raise ValueError(f"Unsupported mode '{mode}'. Choose 'mse' or 'cosine'.")


def bce_with_logits(
    logits: jax.Array,
    targets: jax.Array,
    pos_weight: jax.Array | None = None,
) -> jax.Array:
    """Numerically-stable binary cross-entropy with logits, matching
    ``torch.nn.functional.binary_cross_entropy_with_logits`` semantics:

        loss = -[pw * y * log(sigmoid(x)) + (1 - y) * log(1 - sigmoid(x))]

    reduced with a mean over all elements. ``pos_weight`` broadcasts against
    ``logits`` (torch broadcasts it the same way).
    """
    targets = targets.astype(logits.dtype)
    # log(sigmoid(x)) = -softplus(-x);  log(1 - sigmoid(x)) = -softplus(x)
    log_p = -jax.nn.softplus(-logits)
    log_not_p = -jax.nn.softplus(logits)
    pw = jnp.ones_like(logits) if pos_weight is None else pos_weight
    loss = -(pw * targets * log_p + (1.0 - targets) * log_not_p)
    return jnp.mean(loss)


def classification_loss(
    predictions: jax.Array,
    targets: jax.Array,
    positive_weight: float | None = None,
) -> jax.Array:
    """Multi-label BCE used by the stage-1 MoCLIP trainers.

    Reproduces the reference's quirky per-sample pos_weight construction
    (/root/reference/losses.py:61-63): ``pos_weight = w * targets + 1`` is an
    elementwise (B, C) tensor, so each *positive* element is weighted
    ``w + 1`` and each negative element keeps weight 1 (the weight only
    multiplies the positive log-term, so negatives are unaffected either way).
    """
    targets = targets.astype(predictions.dtype)
    if positive_weight is not None:
        pos_weight = positive_weight * targets + 1.0
    else:
        pos_weight = None
    return bce_with_logits(predictions, targets, pos_weight=pos_weight)


def cross_entropy_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Single-label softmax cross entropy for the MammalNet variants.

    The reference feeds one-hot labels through ``labels.argmax(dim=1)`` into
    ``nn.CrossEntropyLoss`` (/root/reference/train_frame_diff_mn.py:102,
    TFAM/train_and_eval_frame_diff_MN.py:59). Accepts either one-hot (B, C)
    float targets or integer (B,) class indices.
    """
    if targets.ndim == logits.ndim:
        target_idx = jnp.argmax(targets, axis=-1)
    else:
        target_idx = targets
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, target_idx[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def reconstruction_loss(reconstruction: jax.Array, inputs: jax.Array) -> jax.Array:
    """Reserved API slot, matching the reference's unimplemented hook
    (/root/reference/losses.py:70-81)."""
    raise NotImplementedError

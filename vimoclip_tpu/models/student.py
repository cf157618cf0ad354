"""MoCLIP student: CLIP-initialised visual encoder over motion frames with a
FROSTER-style residual-MLP distillation branch and a classification head.

Reference: models/student_model.py (flow) and models/student_model_frame_diff.py
(frame-diff) — byte-identical architectures (SURVEY.md #6/#7); here one model
serves both modalities.

Forward parity (student_model.py:61-98):
- (B, T, H, W, 3) uint8 motion frames -> flatten to (B*T, ...) ->
  CLIP preprocess -> ViT-B/32 visual encoder (float32) -> (B, T, 512);
  the reference does the preprocessing per-frame in PIL inside forward
  (:77-78), here it's the fused on-device op over the whole batch.
- distillation branch: ``x + alpha * fc2(gelu(fc1(x)))`` with fc2
  zero-initialised and fixed alpha=0.1 (ResidualMLP, :8-35).
- classification branch: temporal mean-pool of the RAW embeddings ->
  Linear(512, 256) -> ReLU -> Linear(256, num_classes) (:55-59, 93-96).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
from vimoclip_tpu.ops.preprocess import clip_preprocess


class ResidualMLP(nn.Module):
    """2-layer GELU MLP with zero-initialised output layer and a scaled
    residual skip (reference student_model.py:8-35)."""

    embed_dim: int
    alpha: float = 0.1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(self.embed_dim, name="fc1")(x)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default
        h = nn.Dense(
            self.embed_dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="fc2",
        )(h)
        return x + self.alpha * h


class StudentModel(nn.Module):
    """Motion-frame student (flow or frame-diff — same architecture).

    Returns ``(embeddings, embeddings_for_distillation, logits)`` matching
    the reference tuple (student_model.py:98).
    """

    vision_config: ClipVisionConfig
    num_classes: int = 140
    alpha: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, motion_frames: jax.Array, preprocessed: bool = False
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Args:
            motion_frames: (B, T, H, W, 3). uint8 raw frames by default;
                with ``preprocessed=True``, already CLIP-normalised float
                (B, T, S, S, 3) — lets the input pipeline fuse preprocessing
                with the host->device transfer.
        """
        b, t = motion_frames.shape[:2]
        frames = motion_frames.reshape((b * t,) + motion_frames.shape[2:])
        if not preprocessed:
            frames = clip_preprocess(
                frames, self.vision_config.image_size, dtype=self.dtype
            )
        embeddings = ClipVisionEncoder(
            self.vision_config, dtype=self.dtype, name="visual_encoder"
        )(frames)
        embeddings = embeddings.reshape(b, t, -1).astype(jnp.float32)

        distill = ResidualMLP(
            embeddings.shape[-1], alpha=self.alpha, name="residual_mlp"
        )(embeddings)

        pooled = jnp.mean(embeddings, axis=1)
        h = nn.Dense(embeddings.shape[-1] // 2, name="head_dense1")(pooled)
        h = nn.relu(h)
        logits = nn.Dense(self.num_classes, name="head_dense2")(h)
        return embeddings, distill, logits

"""Flax CLIP ViT visual encoder.

TPU-native replacement for the frozen CLIP teachers and the CLIP-initialised
student backbone of the reference:

- teacher extraction uses HF ``CLIPModel.get_image_features`` with ViT-B/16
  (AK, reference extract_embeddings.py:17) and ViT-B/32 (MammalNet,
  extract_embeddings_mammalNet.py:25);
- the student wraps OpenAI ``clip.load("ViT-B/32").visual`` cast to float32
  (reference models/student_model.py:44-48).

Both checkpoints hold the same math: patchify conv (no bias) -> prepend CLS
-> learned position embeddings -> pre-LN -> N pre-norm transformer blocks
(MHA + QuickGELU MLP) -> post-LN on CLS -> linear projection to the shared
embedding space. Weight converters for both serialization formats live in
``vimoclip_tpu.models.clip_convert``.

TPU-first design notes:
- NHWC input layout (B, H, W, 3): XLA:TPU's native conv layout, and the
  patchify conv lowers to a single MXU matmul of (B*grid², p²*3) x (p²*3, E).
- The whole stack is static-shape; frames from many videos are flattened
  into one big (B*T, 224, 224, 3) batch so the MXU stays saturated —
  the reference instead looped PIL per frame inside forward
  (student_model.py:77-78).
- ``dtype=bfloat16`` runs the matmuls in bf16 with f32 accumulation
  (params stay f32).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from vimoclip_tpu.ops.attention import MultiHeadAttention


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"
    # Attention implementation for the encoder blocks ("xla" | "flash" |
    # "auto", see ops.attention.MultiHeadAttention). "xla" is the parity
    # default: at the ViT's t=197 the XLA path wins (docs/PERF.md crossover
    # + the extraction A/B in the optimization ledger).
    attention_impl: str = "xla"
    # Head-projection scheduling in the encoder's MHA ("split" | "fused" |
    # "fused_qkv", ops/attention.py): identical params/math, different XLA
    # scheduling of the head-major transposes. "fused" is the measured
    # winner at the ViT geometry (E=768, 12 heads): extraction forward
    # +3.1%, student train step +2.5% on the chip — while the SAME change
    # loses 5% at TFAM's E=512 geometry, which keeps "split"
    # (docs/PERF.md ledger 17; tools/bench_headproj.py both targets).
    head_proj: str = "fused"
    # Matmul quantization for the encoder blocks (None | "int8",
    # ops/quant.py): dynamic-int8 MXU matmuls for the attention projections
    # + MLP (~94% of the ViT's matmul FLOPs) on inference-only forwards
    # (teacher extraction / serving). The patchify conv and the final
    # visual_projection stay in ``dtype``: together they are ~3% of the
    # FLOPs, and the projection writes the embedding directly — keeping it
    # float costs nothing and removes the largest single error term.
    # Strictly opt-in (approximation; parity surfaces default to None).
    matmul_quant: str | None = None
    # Token merging (ops/tome.py): merge this many spatially-redundant
    # patch tokens after every encoder block (bipartite soft matching,
    # static shapes — each block compiles at its own fixed token count).
    # 0 = off (the parity default). Like matmul_quant, an opt-in
    # approximation: r=16 halves ViT-B/16 block FLOPs at the paper's
    # sub-point ImageNet accuracy cost (Bolya et al., ICLR 2023).
    token_merge_r: int = 0

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def vit_b_16() -> "ClipVisionConfig":
        return ClipVisionConfig(patch_size=16)

    @staticmethod
    def vit_b_32() -> "ClipVisionConfig":
        return ClipVisionConfig(patch_size=32)


def quick_gelu(x: jax.Array) -> jax.Array:
    """OpenAI CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


class ClipEncoderLayer(nn.Module):
    """Pre-norm transformer block (HF CLIPEncoderLayer numerics)."""

    config: ClipVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        act = quick_gelu if cfg.hidden_act == "quick_gelu" else (
            lambda t: nn.gelu(t, approximate=False)
        )
        from vimoclip_tpu.ops.quant import make_dense

        dense_cls = make_dense(cfg.matmul_quant)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm1")(x)
        h = MultiHeadAttention(
            cfg.hidden_size, cfg.num_heads, dtype=self.dtype,
            implementation=cfg.attention_impl, quant=cfg.matmul_quant,
            head_proj=cfg.head_proj, name="attn"
        )(h, deterministic=True)
        x = x + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm2")(x)
        h = dense_cls(cfg.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = act(h)
        h = dense_cls(cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class ClipVisionEncoder(nn.Module):
    """CLIP visual tower: images -> projected embeddings.

    ``__call__(pixels)`` takes NHWC float images (already CLIP-normalised,
    see vimoclip_tpu.ops.preprocess) and returns the (B, projection_dim)
    image embeddings — the exact quantity the reference stores in HDF5
    (``get_image_features``, extract_embeddings.py:94).
    """

    config: ClipVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixels: jax.Array, return_hidden: bool = False):
        cfg = self.config
        b = pixels.shape[0]
        if pixels.shape[1:] != (cfg.image_size, cfg.image_size, 3):
            raise ValueError(
                f"expected NHWC ({cfg.image_size},{cfg.image_size},3) input, "
                f"got {pixels.shape[1:]}"
            )

        patches = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(pixels.astype(self.dtype))
        patches = patches.reshape(b, cfg.num_patches, cfg.hidden_size)

        class_embedding = self.param(
            "class_embedding",
            nn.initializers.normal(stddev=0.02),
            (cfg.hidden_size,),
        )
        cls = jnp.broadcast_to(
            class_embedding.astype(self.dtype), (b, 1, cfg.hidden_size)
        )
        x = jnp.concatenate([cls, patches], axis=1)

        position_embedding = self.param(
            "position_embedding",
            nn.initializers.normal(stddev=0.02),
            (cfg.num_patches + 1, cfg.hidden_size),
        )
        x = x + position_embedding.astype(self.dtype)[None]

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="pre_layernorm")(x)
        # all-zero schedule when token merging is off: ONE layer loop for
        # the parity and opt-in paths (they must never drift)
        schedule = [0] * (cfg.num_layers - 1)
        sizes = None
        if cfg.token_merge_r:
            from vimoclip_tpu.ops.tome import merge_schedule

            schedule = merge_schedule(
                cfg.num_patches + 1, cfg.num_layers, cfg.token_merge_r
            )
            sizes = jnp.ones(x.shape[:2], jnp.float32)
        for i in range(cfg.num_layers):
            x = ClipEncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < cfg.num_layers - 1 and schedule[i]:
                from vimoclip_tpu.ops.tome import bipartite_merge

                x, sizes = bipartite_merge(x, sizes, schedule[i])

        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="post_layernorm")(
            x[:, 0, :]
        )
        embeds = nn.Dense(
            cfg.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)
        if return_hidden:
            return embeds, x
        return embeds

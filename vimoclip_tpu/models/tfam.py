"""TFAM — Temporal Fusion of Appearance and Motion.

Flax re-design of the reference fusion transformer ``AMO_CLIP``
(/root/reference/TFAM/models/AMO_CLIP.py). Numerics match the reference:

- ``AttentionLayer`` (AMO_CLIP.py:6-51): post-norm block —
  self-attn -> +residual -> LN, optional cross-attn -> +residual -> LN,
  FFN(Linear d->ff, ReLU/GELU, Dropout, Linear ff->d, Dropout)
  -> +residual -> LN. All LayerNorms eps=1e-5 (torch default).
- Four fusion modes (AMO_CLIP.py:136-167): rgb-only / motion-only self-attn;
  cross-attention with queries = RGB stream and keys/values = the ORIGINAL
  motion embeddings at every layer; self-attn over a temporal (concat_dim=1)
  or channel (concat_dim=-1, 1024->512 projection) concatenation, with RGB
  truncated by one frame to align with the T-1 motion frames
  (AMO_CLIP.py:153-154).
- Optional sinusoidal positional encoding (AMO_CLIP.py:88-97).
- Classifier head: mean-pool over the sequence — pads INCLUDED, matching the
  reference's unmasked pooling (AMO_CLIP.py:170) — then
  LN -> Linear(d->d/2) -> exact GELU -> Dropout(mlp_dropout) -> Linear(d/2->C).
  ``masked_pooling=True`` enables the fixed (mask-aware) variant.

Masks use the collate convention True = real frame (TFAM/data/dataset.py:89-103);
inversion to key-padding happens here (AMO_CLIP.py:125-126).

TPU-first notes: the whole forward is static-shape (padded + bucketed
upstream), so jit compiles one program per length bucket; attention runs
through vimoclip_tpu.ops.attention (XLA-fused, Pallas flash option); params
carry the partition rules in vimoclip_tpu.parallel.partition for dp x tp
meshes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from vimoclip_tpu.config import TFAMModelConfig
from vimoclip_tpu.ops.attention import MultiHeadAttention

_LN_EPS = 1e-5  # torch nn.LayerNorm default


def sinusoidal_positional_encoding(seq_len: int, d_model: int) -> jax.Array:
    """Sinusoidal PE table, (seq_len, d_model). Matches AMO_CLIP.py:88-97."""
    position = jnp.arange(seq_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, d_model, 2, dtype=jnp.float32) * (-jnp.log(10000.0) / d_model)
    )
    angles = position * div_term  # (T, d_model/2)
    pe = jnp.zeros((seq_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(angles))
    pe = pe.at[:, 1::2].set(jnp.cos(angles))
    return pe


class AttentionLayer(nn.Module):
    """Post-norm transformer block with optional cross-attention."""

    d_model: int
    num_heads: int
    dim_feedforward: int
    dropout: float = 0.1
    activation: str = "relu"  # reference AttentionLayer default (AMO_CLIP.py:13)
    attention_impl: str = "xla"
    head_proj: str = "split"  # "fused" folds head split/merge into the matmuls
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 matmuls; params f32)
    # For attention_impl="ring": mesh with a "seq" axis + the batch axis name
    # (runtime objects; threaded from TFAM, never from YAML).
    seq_mesh: jax.sharding.Mesh | None = None
    seq_batch_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        cross_src: jax.Array | None = None,
        src_key_padding_mask: jax.Array | None = None,
        cross_key_padding_mask: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        # 8-bit-mask dropout (ops.dropout): the five per-layer elementwise
        # masks are pure HBM traffic — thin bits cut it 4x, ~0.5 ms/step on
        # the t512 recipe (docs/PERF.md #4). Unbiased; keep-prob quantized
        # to 1/256 (<0.2% shift); bit stream impl-defined as always.
        from vimoclip_tpu.ops.dropout import Dropout as ThinDropout

        drop = lambda t: ThinDropout(self.dropout, deterministic=deterministic)(t)
        ln = lambda name: nn.LayerNorm(epsilon=_LN_EPS, name=name)

        attn_out = MultiHeadAttention(
            self.d_model, self.num_heads, dropout=self.dropout,
            dtype=self.dtype, implementation=self.attention_impl,
            head_proj=self.head_proj,
            seq_mesh=self.seq_mesh, seq_batch_axis=self.seq_batch_axis,
            name="self_attn"
        )(x, key_padding_mask=src_key_padding_mask, deterministic=deterministic)
        x = ln("norm_self")(x + drop(attn_out))

        if cross_src is not None:
            attn_out = MultiHeadAttention(
                self.d_model, self.num_heads, dropout=self.dropout,
                dtype=self.dtype, implementation=self.attention_impl,
                head_proj=self.head_proj,
                seq_mesh=self.seq_mesh, seq_batch_axis=self.seq_batch_axis,
                name="cross_attn"
            )(
                x,
                kv=cross_src,
                key_padding_mask=cross_key_padding_mask,
                deterministic=deterministic,
            )
            x = ln("norm_cross")(x + drop(attn_out))

        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="ffn_dense1")(x)
        h = nn.gelu(h, approximate=False) if self.activation == "gelu" else nn.relu(h)
        h = drop(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ffn_dense2")(h)
        h = drop(h)
        x = ln("norm_ffn")(x + drop(h))
        return x


class TFAM(nn.Module):
    """Fusion transformer over paired RGB / motion embedding sequences."""

    config: TFAMModelConfig
    num_classes: int = 140
    dtype: jnp.dtype = jnp.float32
    # For config.attention_impl="ring" (beyond-HBM videos): the mesh whose
    # "seq" axis shards time, plus the batch axis name. Runtime objects —
    # serving/eval code passes them when constructing the model; YAML can
    # select the impl but never carries the mesh (docs/SCALING.md).
    seq_mesh: jax.sharding.Mesh | None = None
    seq_batch_axis: str | None = None

    @nn.compact
    def __call__(
        self,
        rgb_emb: jax.Array,
        motion_emb: jax.Array,
        mask_rgb: jax.Array | None = None,
        mask_flow: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Args use the collate convention: masks True = real frame.

        Returns (B, num_classes) logits.
        """
        cfg = self.config

        # Invert validity masks to key-padding masks (AMO_CLIP.py:125-126).
        attn_rgb = None if mask_rgb is None else ~mask_rgb
        attn_flow = None if mask_flow is None else ~mask_flow

        if cfg.use_pe:  # AMO_CLIP.py:129-134
            rgb_emb = rgb_emb + sinusoidal_positional_encoding(
                rgb_emb.shape[1], cfg.d_model
            )[None].astype(rgb_emb.dtype)
            motion_emb = motion_emb + sinusoidal_positional_encoding(
                motion_emb.shape[1], cfg.d_model
            )[None].astype(motion_emb.dtype)

        layers = [
            AttentionLayer(
                cfg.d_model,
                cfg.nhead,
                cfg.dim_feedforward,
                dropout=cfg.dropout,
                activation=cfg.activation,
                attention_impl=cfg.attention_impl,
                head_proj=cfg.head_proj,
                dtype=self.dtype,
                seq_mesh=self.seq_mesh,
                seq_batch_axis=self.seq_batch_axis,
                name=f"layers_{i}",
            )
            for i in range(cfg.num_layers)
        ]

        # Reference pooling is UNMASKED over the per-batch-max padded length
        # (AMO_CLIP.py:170). Our sequences may carry extra XLA bucket padding
        # beyond the batch max, so exact parity needs pooling limited to the
        # positions the reference layout would contain: ``pool_limits``
        # collects (segment_capacity, batch_max_length) pairs along the
        # sequence; the mean runs over the first batch_max positions of each
        # segment (real frames AND the reference's within-batch pads) and
        # divides by the summed batch-max lengths.
        def batch_max(mask, cap):
            if mask is None:
                return jnp.asarray(cap, jnp.int32)
            return jnp.minimum(
                jnp.max(jnp.sum(mask.astype(jnp.int32), axis=1)), cap
            )

        pool_mask = None  # per-video validity; used when cfg.masked_pooling
        if cfg.use_only_rgb:
            x, pool_mask = rgb_emb, mask_rgb
            pool_limits = [(x.shape[1], batch_max(mask_rgb, x.shape[1]))]
            for layer in layers:
                x = layer(x, src_key_padding_mask=attn_rgb, deterministic=deterministic)
        elif cfg.use_only_flow:
            x, pool_mask = motion_emb, mask_flow
            pool_limits = [(x.shape[1], batch_max(mask_flow, x.shape[1]))]
            for layer in layers:
                x = layer(x, src_key_padding_mask=attn_flow, deterministic=deterministic)
        elif cfg.use_cross_attention:
            # Queries = RGB stream; keys/values = ORIGINAL motion embeddings
            # at every layer (AMO_CLIP.py:146-150).
            x, pool_mask = rgb_emb, mask_rgb
            pool_limits = [(x.shape[1], batch_max(mask_rgb, x.shape[1]))]
            for layer in layers:
                x = layer(
                    x,
                    cross_src=motion_emb,
                    src_key_padding_mask=attn_rgb,
                    cross_key_padding_mask=attn_flow,
                    deterministic=deterministic,
                )
        else:
            # Self-attention over a concatenation; RGB drops its last frame to
            # align with the T-1 motion frames (AMO_CLIP.py:153-154). The
            # reference truncates the BATCH-MAX layout, i.e. drops position
            # batchmax-1 (the final real frame of full-length videos, a pad
            # of shorter ones). Under bucket padding the batch max sits
            # before the physical end, so positions >= batchmax-1 are masked
            # out of the key set explicitly.
            s1_cap = rgb_emb.shape[1] - 1
            rgb_emb = rgb_emb[:, :-1, :]
            if attn_rgb is not None:
                keep = jnp.arange(s1_cap) < (batch_max(mask_rgb, s1_cap + 1) - 1)
                attn_rgb = attn_rgb[:, :-1] | ~keep[None, :]
            if cfg.concat_dim == 1:  # temporal concat
                s1, s2 = rgb_emb.shape[1], motion_emb.shape[1]
                x = jnp.concatenate([rgb_emb, motion_emb], axis=1)
                attn_mask = (
                    None
                    if attn_rgb is None or attn_flow is None
                    else jnp.concatenate([attn_rgb, attn_flow], axis=1)
                )
                # reference segment lengths: (batchmax_rgb - 1) + batchmax_mot
                lim1 = (
                    jnp.asarray(s1, jnp.int32)
                    if mask_rgb is None
                    else jnp.minimum(batch_max(mask_rgb, s1 + 1) - 1, s1)
                )
                pool_limits = [(s1, lim1), (s2, batch_max(mask_flow, s2))]
            elif cfg.concat_dim == -1:  # channel concat + projection
                # bucket padding can leave the streams at different padded
                # lengths; align to the common capacity (reference always has
                # exactly T-1 == T-1 here)
                common = min(rgb_emb.shape[1], motion_emb.shape[1])
                rgb_emb = rgb_emb[:, :common]
                motion_c = motion_emb[:, :common]
                attn_flow_c = None if attn_flow is None else attn_flow[:, :common]
                x = jnp.concatenate([rgb_emb, motion_c], axis=-1)
                x = nn.Dense(cfg.d_model, name="projection_layer")(x)
                # Reference keeps only the flow mask here (AMO_CLIP.py:160).
                attn_mask = attn_flow_c
                pool_limits = [(common, batch_max(mask_flow, common))]
            else:
                raise ValueError(f"concat_dim must be 1 or -1, got {cfg.concat_dim}")
            pool_mask = None if attn_mask is None else ~attn_mask
            for layer in layers:
                x = layer(x, src_key_padding_mask=attn_mask, deterministic=deterministic)

        if cfg.masked_pooling and pool_mask is not None:
            m = pool_mask[..., None].astype(x.dtype)
            pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
        else:
            # Reference-exact unmasked mean: include the first batch_max
            # positions of each segment, divide by their sum.
            include = []
            denom = jnp.asarray(0, jnp.int32)
            for cap, limit in pool_limits:
                include.append(jnp.arange(cap) < limit)
                denom = denom + limit
            inc = jnp.concatenate(include) if len(include) > 1 else include[0]
            pooled = jnp.sum(
                x * inc[None, :, None].astype(x.dtype), axis=1
            ) / jnp.maximum(denom, 1).astype(x.dtype)

        # Head in float32 even when the trunk runs bf16: the classifier is
        # tiny, f32 logits stabilise the loss, and — decisive for
        # DeviceMultilabelAveragePrecision — full-mantissa logits avoid the
        # frequent exact ties an 8-bit bf16 mantissa produces, which would
        # make the on-device ranking metric diverge from the host metric.
        h = nn.LayerNorm(epsilon=_LN_EPS, name="classifier_norm")(
            pooled.astype(jnp.float32)
        )
        h = nn.Dense(cfg.d_model // 2, name="classifier_dense1")(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default = exact erf
        h = nn.Dropout(cfg.mlp_dropout, deterministic=deterministic)(h)
        return nn.Dense(self.num_classes, name="classifier_dense2")(h)

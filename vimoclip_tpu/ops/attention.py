"""Masked multi-head attention with ``torch.nn.MultiheadAttention`` numerics.

The reference's TFAM attends over whole padded videos with key-padding masks
(/root/reference/TFAM/models/AMO_CLIP.py:37-51,118-126), and its CLIP visual
encoder uses standard MHA. This module is the single attention implementation
shared by both, written so XLA keeps the QK^T -> softmax -> PV chain fused and
batched on the MXU:

- scale = 1/sqrt(head_dim) applied to Q (torch semantics),
- key-padding mask adds a large negative to masked key columns,
- attention-weight dropout (train only),
- separate q/k/v projections whose weights are the split of torch's packed
  ``in_proj_weight`` (the converter in models/torch_compat.py does the split).

A fused Pallas flash-attention kernel (vimoclip_tpu.ops.pallas) can be
swapped in via ``implementation="flash"`` for long sequences; the XLA path is
the reference-numerics default.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

# Additive mask value. Large-finite (not -inf) so fully-masked rows produce a
# uniform distribution instead of NaN (torch produces NaN there; such rows
# never occur in the pipeline because every video has >= 1 real frame, and
# finite masking keeps gradients clean).
_MASK_VALUE = -1e9


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: jax.Array | None = None,
    dropout_rate: float = 0.0,
    deterministic: bool = True,
    dropout_rng: jax.Array | None = None,
    precision=None,
) -> jax.Array:
    """Scaled dot-product attention.

    Args:
        q: (B, H, Tq, Dh) queries.
        k: (B, H, Tk, Dh) keys.
        v: (B, H, Tk, Dh) values.
        key_padding_mask: optional (B, Tk) boolean, True = IGNORE this key
            (torch ``key_padding_mask`` convention — callers holding
            "True = real" validity masks invert before calling, mirroring
            reference AMO_CLIP.py:125-126).
    Returns:
        (B, H, Tq, Dh) attention output.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=q.dtype))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k, precision=precision)
    if key_padding_mask is not None:
        bias = jnp.where(key_padding_mask[:, None, None, :], _MASK_VALUE, 0.0)
        scores = scores + bias.astype(scores.dtype)
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and not deterministic:
        if dropout_rng is None:
            raise ValueError("dropout_rng required for non-deterministic attention")
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v, precision=precision)


class _FusedHeadProj(nn.Module):
    """(B, T, E) -> (B, H, T, Dh) projection with ``nn.Dense``'s EXACT param
    layout (kernel (E, E), bias (E,), same initializers) — the head split +
    transpose is folded into the matmul's output indexing (einsum), so XLA
    can materialise the head-major layout as the matmul writes instead of
    keeping a separate transpose op (the 0.6 ms/step "data formatting"
    slice of the TFAM trace, docs/PERF.md).

    ``quant="int8"`` runs the contraction on int8 operands with the SAME
    dynamic scales as ``Int8Dense`` (per-token activation rows, per-output-
    channel kernel columns — ops/quant.py), so the result is bit-identical
    to Int8Dense-then-split: the int32 accumulations are exact and the
    output indexing changes nothing about them."""

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        e, h = self.embed_dim, self.num_heads
        dh = e // h
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (e, e), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (e,), jnp.float32)
        if self.quant == "int8":
            from vimoclip_tpu.ops.quant import quantize_absmax

            xq, xs = quantize_absmax(x, -1)            # (B,T,E), (B,T,1)
            wq, ws = quantize_absmax(kernel, 0)        # (E,E), (1,E)
            acc = jnp.einsum(
                "btd,dhk->bhtk",
                xq,
                wq.reshape(e, h, dh),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * (
                xs[:, None, :, :] * ws.reshape(1, h, 1, dh)
            )
        else:
            y = jnp.einsum(
                "btd,dhk->bhtk",
                x.astype(self.dtype),
                kernel.reshape(e, h, dh).astype(self.dtype),
            )
        return (
            y + bias.reshape(h, dh)[None, :, None, :].astype(y.dtype)
        ).astype(self.dtype)


class _FusedOutProj(nn.Module):
    """(B, H, T, Dh) -> (B, T, E) output projection, ``nn.Dense`` param
    layout, head-major -> token-major transpose folded into the matmul.
    ``quant="int8"``: see _FusedHeadProj — the per-token activation scale
    reduces over (head, Dh), the merged-layout row, so it matches
    merge-then-Int8Dense bit for bit."""

    embed_dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    quant: str | None = None

    @nn.compact
    def __call__(self, y: jax.Array) -> jax.Array:
        e, h = self.embed_dim, self.num_heads
        dh = e // h
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (e, e), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (e,), jnp.float32)
        if self.quant == "int8":
            from vimoclip_tpu.ops.quant import quantize_absmax

            yq, ys = quantize_absmax(y, (1, 3))        # scale (B,1,T,1)
            wq, ws = quantize_absmax(kernel, 0)        # (E,E), (1,E)
            acc = jnp.einsum(
                "bhtd,hde->bte",
                yq,
                wq.reshape(h, dh, e),
                preferred_element_type=jnp.int32,
            )
            out = acc.astype(jnp.float32) * (ys[:, 0] * ws[None])
        else:
            out = jnp.einsum(
                "bhtd,hde->bte",
                y.astype(self.dtype),
                kernel.reshape(h, dh, e).astype(self.dtype),
            )
        return (out + bias.astype(out.dtype)).astype(self.dtype)


class MultiHeadAttention(nn.Module):
    """torch-compatible MHA: q/k/v/out projections with bias, attention
    dropout, key-padding masking.

    Parameter layout (for the partition rules in vimoclip_tpu.parallel and
    the torch converters): ``q_proj``, ``k_proj``, ``v_proj``, ``out_proj``
    Dense kernels of shape (embed, embed) = torch ``in_proj_weight`` splits
    transposed.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # Attention implementation:
    # - "xla": reference numerics; attention dropout drawn host-style
    #   (jax.random.bernoulli masks materialised by XLA).
    # - "flash": Pallas online-softmax kernel (ops.pallas.flash_attention);
    #   attention dropout, when active, is FUSED — bits from the on-chip
    #   PRNG inside the tile loop, nothing (Tq, Tk)-shaped materialised.
    # - "auto": pick by shape/mode — flash when its measured domain wins
    #   (dropout training steps, long sequences), XLA otherwise; never off
    #   the TPU backend (elsewhere flash would run in interpreter mode).
    #   The crossover table lives in docs/PERF.md.
    #   CAVEAT (ADVICE r2 #4): "auto" keys off jax.default_backend(), i.e.
    #   it assumes the computation runs on the process default device. In a
    #   TPU-default process that explicitly places a long-T computation on
    #   CPU (jax.default_device / device_put) it would still pick the Mosaic
    #   kernel and fail to lower — pin implementation="xla" for such
    #   off-default placements.
    # - "ring": sequence-parallel ring attention (parallel/sequence.py) —
    #   time sharded over ``seq_mesh``'s ``seq`` axis, K/V blocks rotated
    #   around the ICI ring. For sequences beyond one chip's HBM; requires
    #   ``seq_mesh``. Attention dropout is supported (global-coordinate
    #   counter PRNG — bits invariant to placement at a fixed seq axis
    #   size; docs/SCALING.md
    #   "Long videos").
    # - "ring_inner": the same per-shard ring body, WITHOUT the shard_map
    #   wrapper — for callers already inside a shard_map whose mesh carries
    #   the "seq" axis (the GPipe pipeline stages, parallel/pipelining.py;
    #   shard_map does not nest). Inputs here are the LOCAL time shards;
    #   ``seq_mesh`` is not used (the axis name is in scope).
    implementation: str = "xla"
    # Mesh for implementation="ring" (must carry a "seq" axis; batch is
    # sharded over ``seq_batch_axis`` when set). A runtime object, so it is
    # threaded programmatically — never from YAML config.
    seq_mesh: jax.sharding.Mesh | None = None
    seq_batch_axis: str | None = None
    # Matmul quantization for the q/k/v/out projections (None | "int8",
    # ops/quant.py): dynamic-int8 MXU path for inference-only forwards.
    # Param layout is unchanged. The attention dots themselves stay in
    # ``dtype`` (they are ~4% of the block's FLOPs and the score tensor's
    # softmax needs float range).
    quant: str | None = None
    # "split" (default): Dense projection then reshape+transpose to head-
    # major (reference numerics path). "fused": fold the head split AND
    # the output re-merge into projection einsums (_FusedHeadProj/
    # _FusedOutProj); "fused_qkv": fold only the q/k/v split, keep the
    # split-path output projection. Identical params and math, different
    # XLA scheduling — the measured experiment against the TFAM trace's
    # 0.6 ms "data formatting" slice (docs/PERF.md). Composes with
    # ``quant`` bit-identically to the split int8 path (same dynamic
    # scales, exact int32 accumulation — tests/test_quant.py).
    head_proj: str = "split"

    # Measured on the v5e chip (docs/PERF.md "flash vs XLA crossover"):
    # with dropout active the fused-PRNG kernel wins from t=256 (and wins
    # the full TFAM train step at t=512: 9.65 vs 10.92 ms); without dropout
    # flash edges ahead from t=2048 (4.06 vs 4.30 ms) and the gap widens as
    # the (T, T) score tensor dominates XLA's HBM traffic — 2.1x at t=8192,
    # and at t=16384 XLA fails to compile outright. The 2048 threshold also
    # bounds attention MEMORY: past it nothing (T, T)-shaped exists.
    _AUTO_FLASH_MIN_T_DROPOUT = 256
    _AUTO_FLASH_MIN_T_NODROP = 2048

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        kv: jax.Array | None = None,
        key_padding_mask: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if self.embed_dim % self.num_heads:
            raise ValueError(
                f"embed_dim {self.embed_dim} not divisible by heads {self.num_heads}"
            )
        kv = x if kv is None else kv
        head_dim = self.embed_dim // self.num_heads
        from vimoclip_tpu.ops.quant import make_dense

        dense_cls = make_dense(self.quant)
        dense = lambda name: dense_cls(self.embed_dim, dtype=self.dtype, name=name)

        def split_heads(t):  # (B, T, E) -> (B, H, T, Dh)
            b, s, _ = t.shape
            return t.reshape(b, s, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        fused_qkv = self.head_proj in ("fused", "fused_qkv")
        fused_out = self.head_proj == "fused"
        if fused_qkv:
            head_proj = lambda name: _FusedHeadProj(
                self.embed_dim, self.num_heads, dtype=self.dtype,
                quant=self.quant, name=name,
            )
            q = head_proj("q_proj")(x)
            k = head_proj("k_proj")(kv)
            v = head_proj("v_proj")(kv)
        else:
            q = split_heads(dense("q_proj")(x))
            k = split_heads(dense("k_proj")(kv))
            v = split_heads(dense("v_proj")(kv))

        dropout_rng = None
        attn_dropout_active = self.dropout > 0.0 and not deterministic
        if attn_dropout_active:
            dropout_rng = self.make_rng("dropout")

        impl = self.implementation
        if impl == "auto":
            min_t = (self._AUTO_FLASH_MIN_T_DROPOUT if attn_dropout_active
                     else self._AUTO_FLASH_MIN_T_NODROP)
            impl = ("flash" if k.shape[2] >= min_t
                    and jax.default_backend() == "tpu" else "xla")

        if impl == "ring":
            from vimoclip_tpu.parallel.sequence import sequence_parallel_attention

            if self.seq_mesh is None:
                raise ValueError(
                    'implementation="ring" needs seq_mesh (a Mesh with a '
                    '"seq" axis) — it is a runtime object, pass it when '
                    "constructing the model"
                )
            # Attention dropout rides the ring too: bits keyed on global
            # (row, key-block) coordinates (parallel/sequence.py), so the
            # reference's dropout-0.1 training recipe trains sequence-
            # parallel, invariant to the (data, seq) LAYOUT at a fixed
            # seq axis size (parallel/sequence.py: resizing the axis
            # re-partitions the block grid and redraws the stream).
            out = sequence_parallel_attention(
                q,
                k,
                v,
                self.seq_mesh,
                key_padding_mask=key_padding_mask,
                batch_axis=self.seq_batch_axis,
                dropout_rate=self.dropout if attn_dropout_active else 0.0,
                dropout_rng=dropout_rng,
            )
        elif impl == "ring_inner":
            from vimoclip_tpu.parallel.mesh import SEQ_AXIS
            from vimoclip_tpu.parallel.sequence import ring_attention

            # Already inside a shard_map (pipeline stages): q/k/v are the
            # LOCAL time shards, the "seq" axis name is in scope, and the
            # padding mask shard travels the ring with its K/V block.
            mask = key_padding_mask
            if mask is None:
                mask = jnp.zeros((k.shape[0], k.shape[2]), bool)
            out = ring_attention(
                q, k, v, mask,
                axis_name=SEQ_AXIS,
                dropout_rate=self.dropout if attn_dropout_active else 0.0,
                dropout_key=dropout_rng,
                batch_axis=self.seq_batch_axis,
            )
        elif impl == "flash":
            from vimoclip_tpu.ops.pallas import flash_attention

            if attn_dropout_active:
                # one independent seed per (row, head): decorrelated bit
                # streams, and (with the kernel's custom_partitioning)
                # bit-identical results under any batch/head sharding
                seed = jax.random.randint(
                    dropout_rng, (q.shape[0], self.num_heads), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
                out = flash_attention(
                    q, k, v, key_padding_mask=key_padding_mask,
                    dropout_rate=self.dropout, dropout_seed=seed,
                )
            else:
                out = flash_attention(q, k, v, key_padding_mask=key_padding_mask)
        else:
            out = dot_product_attention(
                q,
                k,
                v,
                key_padding_mask=key_padding_mask,
                dropout_rate=self.dropout,
                deterministic=deterministic,
                dropout_rng=dropout_rng,
            )
        if fused_out:
            return _FusedOutProj(
                self.embed_dim, self.num_heads, dtype=self.dtype,
                quant=self.quant, name="out_proj",
            )(out)
        b, _, s, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, s, self.embed_dim)
        return dense("out_proj")(out)

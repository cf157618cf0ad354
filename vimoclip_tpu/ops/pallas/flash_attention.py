"""Pallas TPU kernel: masked multi-head attention (flash-style, block-Q),
forward AND backward (custom VJP), so the fused kernel serves training too.

The TFAM fusion model attends over ENTIRE padded videos (no frame cap,
reference TFAM/train_and_eval.py:373,396; clips reach 450+ frames), so the
(Tq, Tk) score matrix is the hot tensor. This kernel streams Q in
``block_q`` tiles while keeping K/V rows of one (batch, head) resident in
VMEM — for D_head=64 and Tk <= 4096 that's <= 2 MB, well inside the ~16 MB
VMEM budget — and never materialises scores or probabilities in HBM:

  forward, grid = (B, H, Tq/block_q):
      S = (q_tile * scale) @ K^T + bias   (MXU)
      P = softmax(S)                      (VPU)
      o_tile = P @ V                      (MXU)

  backward (same grid; P recomputed from the residuals — classic
  flash-attention recompute, so nothing (Tq, Tk)-shaped is ever stored):
      dV += P^T @ dO
      dP  = dO @ V^T
      dS  = P * (dP - rowsum(dP * P))
      dQ  = (dS @ K) * scale
      dK += (dS^T @ q_tile) * scale
  dK/dV accumulate across Q tiles in VMEM: their output blocks map to the
  same index for every qi step, so Pallas keeps them resident while the
  innermost grid dimension sweeps the Q tiles.

Numerics match ops.attention.dot_product_attention (same scaling, same
additive -1e9 masking). No attention dropout — the XLA path serves
dropout-in-attention configs; with dropout=0.0 this kernel trains.

On non-TPU backends the kernels run in interpreter mode (tests exercise
them on CPU; the compiled path is exercised on the real chip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -1e9


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    # blocks carry leading (1, 1) batch/head dims; peel them off
    q = q_ref[0, 0] * scale                      # (block_q, d)
    k = k_ref[0, 0]                              # (t_k, d)
    v = v_ref[0, 0]
    bias = bias_ref[0]                           # (1, t_k) -> broadcasts
    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    o_ref[0, 0] = jnp.dot(
        probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _attn_bwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale
):
    qi = pl.program_id(2)
    q = q_ref[0, 0]                              # (block_q, d)
    k = k_ref[0, 0]                              # (t_k, d)
    v = v_ref[0, 0]
    bias = bias_ref[0]                           # (1, t_k)
    do = do_ref[0, 0].astype(jnp.float32)        # (block_q, d)

    scores = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32) + bias
    probs = jax.nn.softmax(scores, axis=-1)      # (block_q, t_k) f32

    # dV partial for this Q tile
    dv_part = jnp.dot(probs.T, do, preferred_element_type=jnp.float32)
    # softmax backward
    dp = jnp.dot(do, v.astype(jnp.float32).T, preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * probs, axis=-1, keepdims=True)
    ds = probs * (dp - delta)                    # (block_q, t_k) f32
    dq_ref[0, 0] = (
        jnp.dot(ds, k.astype(jnp.float32), preferred_element_type=jnp.float32)
        * scale
    ).astype(dq_ref.dtype)
    dk_part = (
        jnp.dot(ds.T, q.astype(jnp.float32), preferred_element_type=jnp.float32)
        * scale
    )

    # accumulate dK/dV across the Q-tile sweep (same out block every qi)
    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = dk_part.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_part.astype(dv_ref.dtype)

    @pl.when(qi > 0)
    def _():
        dk_ref[0, 0] = dk_ref[0, 0] + dk_part.astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_ref[0, 0] + dv_part.astype(dv_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_core(q, k, v, bias, block_q, interpret):
    """Padded-shape core: q (B,H,Tq,D), k/v (B,H,Tk,D), bias (B,1,Tk)."""
    return _flash_fwd_call(q, k, v, bias, block_q, interpret)


def _flash_fwd_call(q, k, v, bias, block_q, interpret):
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    grid = (b, h, tq // block_q)
    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(
        (1, 1, tk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec(
        (1, 1, tk), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, tq, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)


def _flash_fwd(q, k, v, bias, block_q, interpret):
    out = _flash_fwd_call(q, k, v, bias, block_q, interpret)
    return out, (q, k, v, bias)


def _flash_bwd(block_q, interpret, residuals, g):
    q, k, v, bias = residuals
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    grid = (b, h, tq // block_q)
    q_spec = pl.BlockSpec(
        (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
        memory_space=pltpu.VMEM,
    )
    kv_spec = pl.BlockSpec(
        (1, 1, tk, d), lambda bi, hi, qi: (bi, hi, 0, 0),
        memory_space=pltpu.VMEM,
    )
    bias_spec = pl.BlockSpec(
        (1, 1, tk), lambda bi, hi, qi: (bi, 0, 0), memory_space=pltpu.VMEM
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, bias_spec, q_spec],
        out_specs=(q_spec, kv_spec, kv_spec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ),
        interpret=interpret,
    )(q, k, v, bias, g)
    # bias derives from the (non-differentiable) padding mask
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), jnp.zeros_like(bias)


_flash_core.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: jax.Array | None = None,
    block_q: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Masked attention, torch MHA numerics. Differentiable (custom VJP with
    a Pallas backward kernel).

    Args:
        q: (B, H, Tq, D) float32/bfloat16.
        k, v: (B, H, Tk, D).
        key_padding_mask: (B, Tk) bool, True = IGNORE key (torch convention).
    Returns:
        (B, H, Tq, D), dtype of q.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, h, tq, d = q.shape
    tk = k.shape[2]

    # Pad Tq to the tile grid and Tk to the lane multiple; padded keys get
    # masked out via the bias so results are exact.
    tq_p = _round_up(tq, block_q)
    tk_p = _round_up(tk, 128)
    if tq_p != tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    if tk_p != tk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))

    if key_padding_mask is None:
        ignore = jnp.zeros((b, tk), dtype=bool)
    else:
        ignore = key_padding_mask
    ignore = jnp.pad(ignore, ((0, 0), (0, tk_p - tk)), constant_values=True)
    bias = jnp.where(ignore, _MASK_VALUE, 0.0).astype(jnp.float32)[:, None, :]

    out = _flash_core(q, k, v, bias, block_q, interpret)
    return out[:, :, :tq, :]

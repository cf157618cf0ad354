"""Pallas TPU kernel: masked multi-head attention (flash-style, block-Q).

The TFAM fusion model attends over ENTIRE padded videos (no frame cap,
reference TFAM/train_and_eval.py:373,396; clips reach 450+ frames), so the
(Tq, Tk) score matrix is the hot tensor. This kernel streams Q in
``block_q`` tiles while keeping K/V rows of one (batch, head) resident in
VMEM — for D_head=64 and Tk <= 4096 that's <= 2 MB, well inside the ~16 MB
VMEM budget — and never materialises scores in HBM:

  grid = (B, H, Tq/block_q)
  per step:  scores = (q_tile * scale) @ K^T  (MXU)
             + additive key-padding bias      (VPU)
             softmax                          (VPU)
             out_tile = probs @ V             (MXU)

Numerics match ops.attention.dot_product_attention (same scaling, same
additive -1e9 masking). Deterministic (no attention dropout) — the XLA path
serves dropout-in-attention during training; TFAM uses this kernel for eval
and for inference/serving, where attention dominates step time.

On non-TPU backends the kernel runs in interpreter mode (tests exercise it
on CPU; the compiled path is exercised on the real chip by bench/serving).
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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: jax.Array | None = None,
    block_q: int = 128,
    interpret: bool | None = None,
) -> jax.Array:
    """Masked attention, torch MHA numerics.

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
    scale = 1.0 / (d ** 0.5)

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
    # bias: (B, 1, Tk_p)

    grid = (b, h, tq_p // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tk_p, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tk_p, d), lambda bi, hi, qi: (bi, hi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, tk_p), lambda bi, hi, qi: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, d), lambda bi, hi, qi: (bi, hi, qi, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, tq_p, d), q.dtype),
        interpret=interpret,
    )(q, k, v, bias)
    return out[:, :, :tq, :]

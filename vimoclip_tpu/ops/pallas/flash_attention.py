"""Pallas TPU kernel: masked multi-head attention with online softmax
(flash-style, blocked over BOTH Q and K), forward AND backward (custom VJP),
with optional IN-KERNEL attention dropout drawn from the on-chip PRNG.

Why this shape of kernel:

- The TFAM fusion model attends over ENTIRE padded videos (no frame cap,
  reference TFAM/train_and_eval.py:373,396; clips reach 450+ frames), so the
  (Tq, Tk) score matrix is the hot tensor. K-blocking + online softmax mean
  nothing (Tq, Tk)-shaped ever exists in HBM *or* has to fit VMEM whole —
  sequence length is bounded by HBM for q/k/v only (the round-2 kernel kept
  all K/V rows of a (batch, head) resident and capped Tk at ~4096).
- Attention dropout (reference AMO_CLIP.py:19-28,35 via
  torch.nn.MultiheadAttention) needs B*H*Tq*Tk random bits per layer. Drawn
  host-style (jax.random.bernoulli) those bits are materialised in HBM —
  a measured ~2 ms/step tax on the TFAM train recipe even with the fast rbg
  generator (docs/PERF.md #1). Here the bits come from the TPU core's own
  PRNG (`pltpu.prng_seed` / `pltpu.prng_random_bits`) inside the tile loop:
  generated in VMEM, used, thrown away. The backward kernels re-seed with
  the same (row/head seed, q-tile, k-tile) tuple and regenerate identical
  bits, so nothing mask-shaped is ever stored.
- Multi-device: the kernels are data-parallel over (batch, head), declared
  to GSPMD via custom_partitioning — under a sharded jit each device runs
  the same program on its local slab (no gather, no replication). Dropout
  seeds are per (row, head), so the bit stream is a function of each row's
  own seed, not its shard-local position: sharded results are bit-identical
  to unsharded ones (tested both at kernel level and through the TFAM
  model on the 8-device CPU mesh).

forward, grid (B, H, nQ, nK), K innermost; VMEM carries (m, l, acc):
    s     = (q_tile * scale) @ k_tile^T + bias          (MXU)
    m'    = max(m, rowmax(s));  p = exp(s - m')          (VPU)
    l     = l * exp(m - m') + rowsum(p)
    p     = p * keep_mask                                [dropout only]
    acc   = acc * exp(m - m') + p @ v_tile               (MXU)
    at nK-1:  o = acc / (l * keep_prob);  lse = m + log l

backward (two sweeps, classic flash recompute from the saved lse):
    dq kernel, grid (B, H, nQ, nK):   accumulates dq across k tiles
    dkv kernel, grid (B, H, nK, nQ):  accumulates dk, dv across q tiles
    with  P  = exp(s - lse)          (exact normalized probs)
          dP = keep ∘ (dO @ V^T) / keep_prob
          dS = P ∘ (dP - D),  D = rowsum(dO ∘ O)  (precomputed, works
          unchanged under dropout because keep∘keep = keep)
          dQ = (dS @ K) * scale;  dK += (dS^T @ Q) * scale;  dV += Pd^T @ dO

Numerics match ops.attention.dot_product_attention (same scaling, same
additive -1e9 masking; with dropout, the same keep-probability/1/(1-p)
scaling — the bit STREAM differs from jax.random, which is fine: the
reference's own stream is torch's). Dropout statistics are validated on
hardware (tests/test_pallas_tpu.py; the CPU interpreter stubs
prng_random_bits to zeros, which this kernel's `bits < threshold` keep
test maps to keep-everything — tests exploit that to check the plumbing).

On non-TPU backends the kernels run in interpreter mode (tests exercise
them on CPU; the compiled path is exercised on the real chip).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.custom_partitioning import custom_partitioning
from jax.experimental.pallas import tpu as pltpu

# the ONE masking constant both implementations share — numerical parity
# between the XLA and flash paths depends on it
from vimoclip_tpu.ops.attention import _MASK_VALUE

_NEG_INF = -1e30
# bias for PADDING keys (tile-grid round-up), strictly below the user-mask
# bias: when a row is fully user-masked, softmax falls back to uniform over
# the REAL keys only — exactly the XLA path's fully-masked behavior
# (ops/attention.py:26-30) — instead of leaking mass onto padding.
_PAD_VALUE = -2e9


def _keep_threshold(dropout_rate: float) -> int:
    """uint32 threshold with keep = (bits < threshold): keep probability is
    round((1-p) * 2^32) / 2^32 — exact to 2^-32 (clamped into uint32 range:
    rates below ~2^-33 would otherwise round to 2^32 and overflow). Zeros
    (the CPU interpreter's stub bits) fall below any nonzero threshold ->
    all-keep."""
    return min(2**32 - 1, int(round((1.0 - dropout_rate) * 2.0**32)))


def _keep_mask(seed_ref, b, h, qi, ki, nk, shape, threshold):
    """Deterministic per-tile Bernoulli keep mask from the on-chip PRNG.

    ``seed_ref`` holds ONE seed PER (batch row, head) (SMEM, local (B, H)):
    that seed plus a (q-tile, k-tile) stream index fold into Mosaic's
    two-value ``prng_seed``, so forward and the two backward sweeps
    regenerate the SAME bits regardless of their grid order — and because
    the stream is keyed by the row/head's own seed (not its position in
    the local shard), the mask is IDENTICAL under any batch/head sharding
    of the kernel (see the custom_partitioning wrappers below)."""
    tile = qi * nk + ki
    pltpu.prng_seed(seed_ref[b, h], tile)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits < jnp.uint32(threshold)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *rest,
                scale, dropout_rate, nk, with_lse, hb):
    # with_lse=False is the inference-only variant (primal _flash_core
    # path): no (B, H, 8, Tq) lse ever allocated or written — serving/eval
    # forwards pay for exactly the output they use. The (m, l, acc) VMEM
    # scratch only exists for the online-softmax multi-K-tile case; the
    # nk==1 plain-softmax branch gets none allocated at all.
    #
    # ``hb`` heads are processed per program instance (PERF.md ledger 18):
    # with d_head=64 the score/PV contractions only half-fill the 128-wide
    # MXU, so a single head's chain serialises MXU and VPU work. Two
    # independent per-head chains in one body let Mosaic's scheduler
    # overlap head j's softmax/dropout (VPU) under head j+1's matmuls
    # (MXU). Per-head numerics are IDENTICAL to hb=1 — same tiles, same
    # order, same dropout streams (seeded by the row/head's own seed).
    lse_ref = rest[0] if with_lse else None
    scr = rest[1:] if with_lse else rest
    m_scr, l_scr, acc_scr = scr if nk > 1 else (None, None, None)
    b, hi, qi, ki = (pl.program_id(i) for i in range(4))

    for j in range(hb):
        h = hi * hb + j
        q = q_ref[0, j]                               # (bq, d)
        k = k_ref[0, j]                               # (bk, d)
        s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32)
        s = s + bias_ref[0]                           # (bq, bk) f32
        v = v_ref[0, j]

        if nk == 1:
            # single K tile: plain softmax, no online bookkeeping/scratch
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            if dropout_rate > 0.0:
                keep = _keep_mask(seed_ref, b, h, qi, 0, nk, p.shape,
                                  _keep_threshold(dropout_rate))
                p = jnp.where(keep, p, 0.0)
            o = jnp.dot(p.astype(v.dtype), v,
                        preferred_element_type=jnp.float32)
            o_ref[0, j] = (o / (l * (1.0 - dropout_rate))).astype(o_ref.dtype)
            if lse_ref is not None:
                # row stats live as (8, bq) tiles (TPU blocks need a sublane
                # dim divisible by 8); all 8 sublanes carry the same row.
                lse_ref[0, j] = jnp.broadcast_to((m + jnp.log(l)).T,
                                                 lse_ref.shape[2:])
            continue

        @pl.when(ki == 0)
        def _(j=j):
            m_scr[j] = jnp.full_like(m_scr[j], _NEG_INF)
            l_scr[j] = jnp.zeros_like(l_scr[j])
            acc_scr[j] = jnp.zeros_like(acc_scr[j])

        m_prev = m_scr[j]                             # (bq, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                        # (bq, bk) f32
        l_scr[j] = l_scr[j] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[j] = m_new
        if dropout_rate > 0.0:
            keep = _keep_mask(seed_ref, b, h, qi, ki, nk, p.shape,
                              _keep_threshold(dropout_rate))
            p = jnp.where(keep, p, 0.0)
        acc_scr[j] = acc_scr[j] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

        @pl.when(ki == nk - 1)
        def _(j=j):
            denom = l_scr[j] * (1.0 - dropout_rate)
            o_ref[0, j] = (acc_scr[j] / denom).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[0, j] = jnp.broadcast_to(
                    (m_scr[j] + jnp.log(l_scr[j])).T, lse_ref.shape[2:]
                )


# ---------------------------------------------------------------------------
# backward: dq sweep (k innermost) and dkv sweep (q innermost)
# ---------------------------------------------------------------------------


def _recompute_probs(seed_ref, q, k, bias, lse, b, h, qi, ki, *,
                     scale, dropout_rate, nk):
    """(P, keep) for one tile: exact softmax probs from the saved lse, and
    the regenerated dropout keep mask (None when dropout is off)."""
    s = jnp.dot(q * scale, k.T, preferred_element_type=jnp.float32) + bias
    p = jnp.exp(s - lse[:, None])                    # (bq, bk) f32
    keep = None
    if dropout_rate > 0.0:
        keep = _keep_mask(seed_ref, b, h, qi, ki, nk, p.shape,
                          _keep_threshold(dropout_rate))
    return p, keep


# Matmul inputs stay in the INPUT dtype (bf16 in production) with f32 MXU
# accumulation — upcasting operands to f32 forces the MXU into multi-pass
# f32 matmuls, measured ~1.8 ms/step slower on the TFAM train recipe.
# Intermediates computed on the VPU (p, ds) are cast down at the dot.


def _dq_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
               delta_ref, dq_ref, *, scale, dropout_rate, nk, hb):
    b, hi, qi, ki = (pl.program_id(i) for i in range(4))
    for j in range(hb):
        h = hi * hb + j
        q = q_ref[0, j]
        k = k_ref[0, j]
        v = v_ref[0, j]
        do = do_ref[0, j]                            # (bq, d)
        p, keep = _recompute_probs(
            seed_ref, q, k, bias_ref[0], lse_ref[0, j, 0], b, h, qi, ki,
            scale=scale, dropout_rate=dropout_rate, nk=nk,
        )
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if keep is not None:
            dp = jnp.where(keep, dp, 0.0) / (1.0 - dropout_rate)
        ds = p * (dp - delta_ref[0, j, 0][:, None])  # (bq, bk) f32
        dq_part = (jnp.dot(ds.astype(k.dtype), k,
                           preferred_element_type=jnp.float32)
                   * scale).astype(dq_ref.dtype)

        @pl.when(ki == 0)
        def _(j=j, dq_part=dq_part):
            dq_ref[0, j] = dq_part

        @pl.when(ki > 0)
        def _(j=j, dq_part=dq_part):
            dq_ref[0, j] = dq_ref[0, j] + dq_part


def _dkv_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref,
                delta_ref, dk_ref, dv_ref, *, scale, dropout_rate, nk, hb):
    # NOTE the grid here is (B, H/hb, nK, nQ): qi is the INNERMOST dimension
    # so dk/dv output blocks stay resident while q tiles sweep past.
    b, hi, ki, qi = (pl.program_id(i) for i in range(4))
    for j in range(hb):
        h = hi * hb + j
        q = q_ref[0, j]
        v = v_ref[0, j]
        do = do_ref[0, j]
        p, keep = _recompute_probs(
            seed_ref, q, k_ref[0, j], bias_ref[0], lse_ref[0, j, 0], b, h,
            qi, ki, scale=scale, dropout_rate=dropout_rate, nk=nk,
        )
        if keep is not None:
            pd = jnp.where(keep, p, 0.0) / (1.0 - dropout_rate)
        else:
            pd = p
        dv_part = jnp.dot(pd.astype(do.dtype).T, do,
                          preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if keep is not None:
            dp = jnp.where(keep, dp, 0.0) / (1.0 - dropout_rate)
        ds = p * (dp - delta_ref[0, j, 0][:, None])
        dk_part = jnp.dot(ds.astype(q.dtype).T, q,
                          preferred_element_type=jnp.float32) * scale

        @pl.when(qi == 0)
        def _(j=j, dk_part=dk_part, dv_part=dv_part):
            dk_ref[0, j] = dk_part
            dv_ref[0, j] = dv_part

        @pl.when(qi > 0)
        def _(j=j, dk_part=dk_part, dv_part=dv_part):
            dk_ref[0, j] = dk_ref[0, j] + dk_part
            dv_ref[0, j] = dv_ref[0, j] + dv_part


def _dqkv_single_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                        lse_ref, delta_ref, dq_ref, dk_ref, dv_ref, *,
                        scale, dropout_rate, nk, hb):
    """Combined backward for nk == 1 (whole K in one tile — the TFAM train
    shapes): one score recompute yields dq, dk AND dv, halving backward
    recompute FLOPs and kernel dispatches vs the two-sweep path.
    Grid (B, H/hb, nQ): dq written once per qi; dk/dv accumulate across
    qi; ``hb`` heads per program (see _fwd_kernel)."""
    b, hi, qi = (pl.program_id(i) for i in range(3))
    for j in range(hb):
        h = hi * hb + j
        q = q_ref[0, j]
        k = k_ref[0, j]
        v = v_ref[0, j]
        do = do_ref[0, j]
        p, keep = _recompute_probs(
            seed_ref, q, k, bias_ref[0], lse_ref[0, j, 0], b, h, qi, 0,
            scale=scale, dropout_rate=dropout_rate, nk=nk,
        )
        if keep is not None:
            pd = jnp.where(keep, p, 0.0) / (1.0 - dropout_rate)
        else:
            pd = p
        dv_part = jnp.dot(pd.astype(do.dtype).T, do,
                          preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        if keep is not None:
            dp = jnp.where(keep, dp, 0.0) / (1.0 - dropout_rate)
        ds = p * (dp - delta_ref[0, j, 0][:, None])
        dq_ref[0, j] = (jnp.dot(ds.astype(k.dtype), k,
                                preferred_element_type=jnp.float32)
                        * scale).astype(dq_ref.dtype)
        dk_part = jnp.dot(ds.astype(q.dtype).T, q,
                          preferred_element_type=jnp.float32) * scale

        @pl.when(qi == 0)
        def _(j=j, dk_part=dk_part, dv_part=dv_part):
            dk_ref[0, j] = dk_part
            dv_ref[0, j] = dv_part

        @pl.when(qi > 0)
        def _(j=j, dk_part=dk_part, dv_part=dv_part):
            dk_ref[0, j] = dk_ref[0, j] + dk_part
            dv_ref[0, j] = dv_ref[0, j] + dv_part


# ---------------------------------------------------------------------------
# pallas_call plumbing
# ---------------------------------------------------------------------------


def _expand_seed(dropout_seed, b: int, h: int) -> jax.Array:
    """Expand a scalar / (B,) / (B, H) user seed to the kernel's per-(row,
    head) (B, H) int32 seed matrix.

    Expansion multiplies the user seed by a golden-ratio odd constant
    (int32 wraparound) before adding slot indices, so CONSECUTIVE scalar
    seeds (a step counter is natural API usage) land ~2.6e9 apart and
    never reuse another step's (seed value, tile) pairs — a plain
    ``seed + arange`` would make seeds s and s+1 share b*h-1 streams."""
    gold = jnp.int32(-1640531527)  # 0x9E3779B9 as int32
    seed = jnp.asarray(dropout_seed, jnp.int32)
    # full (B, H) passes through untouched — checked FIRST so a (1, 1)
    # matrix at B=H=1 isn't misrouted through the scalar expansion
    if seed.shape == (b, h):
        return seed
    if seed.size == 1:
        return seed.reshape(()) * gold + jnp.arange(
            b * h, dtype=jnp.int32
        ).reshape(b, h)
    if seed.shape == (b,):
        return seed[:, None] * gold + jnp.arange(h, dtype=jnp.int32)[None, :]
    raise ValueError(
        f"dropout_seed must be scalar, (B,), or (B, H); got "
        f"{seed.shape} for B={b}, H={h}"
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _largest_dividing_block(t_p: int, block: int) -> int:
    """Largest multiple of 128 that divides ``t_p`` (itself a multiple of
    128) and is <= block. 128 always qualifies, so sequences never pad
    beyond their 128-rounded length just to fill a tile grid."""
    best = 128
    for b in range(2 * 128, min(block, t_p) + 1, 128):
        if t_p % b == 0:
            best = b
    return best


def _heads_per_block(h: int) -> int:
    """Heads packed into one program instance (PERF.md ledger 18): 2 when
    the LOCAL head count divides evenly, else 1. Decided from per-shard
    shapes inside _fwd_local/_bwd_local so head-sharded meshes adapt
    automatically — and since per-head numerics are identical either way,
    sharded==unsharded bit-exactness is preserved across the choice."""
    return 2 if h % 2 == 0 else 1


def _specs(bq, bk, d, hb):
    """Common BlockSpecs keyed by grid position names. Index maps take the
    4 grid coords in their kernel-specific order; callers pass lambdas.
    Blocks carry ``hb`` heads (dim 1); a head-grid index hi addresses
    element offset hi*hb. Row statistics (lse, delta) are carried as
    (B, H, 8, T) with the row replicated over 8 sublanes — TPU block
    shapes need the second-to-last dim divisible by 8."""
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    q_spec = lambda im: pl.BlockSpec((1, hb, bq, d), im, memory_space=pltpu.VMEM)
    kv_spec = lambda im: pl.BlockSpec((1, hb, bk, d), im, memory_space=pltpu.VMEM)
    bias_spec = lambda im: pl.BlockSpec((1, 1, bk), im, memory_space=pltpu.VMEM)
    row_spec = lambda im: pl.BlockSpec((1, hb, 8, bq), im, memory_space=pltpu.VMEM)
    return seed_spec, q_spec, kv_spec, bias_spec, row_spec


def _fwd_local(q, k, v, bias, seed, dropout_rate, block_q, block_k,
               interpret, need_lse):
    """The forward pallas_call on (possibly per-shard local) shapes."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    nq, nk = tq // block_q, tk // block_k
    hb = _heads_per_block(h)
    seed_spec, q_spec, kv_spec, bias_spec, row_spec = _specs(
        block_q, block_k, d, hb
    )
    out_specs = [q_spec(lambda bi, hi, qi, ki: (bi, hi, qi, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, h, tq, d), q.dtype)]
    if need_lse:
        out_specs.append(row_spec(lambda bi, hi, qi, ki: (bi, hi, 0, qi)))
        out_shape.append(jax.ShapeDtypeStruct((b, h, 8, tq), jnp.float32))
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale,
                          dropout_rate=dropout_rate, nk=nk,
                          with_lse=need_lse, hb=hb),
        grid=(b, h // hb, nq, nk),
        in_specs=[
            seed_spec,
            q_spec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            kv_spec(lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            kv_spec(lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            bias_spec(lambda bi, hi, qi, ki: (bi, 0, ki)),
        ],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=[
            pltpu.VMEM((hb, block_q, 1), jnp.float32),  # running max m
            pltpu.VMEM((hb, block_q, 1), jnp.float32),  # running denom l
            pltpu.VMEM((hb, block_q, d), jnp.float32),  # output accumulator
        ] if nk > 1 else [],
        # only the K sweep carries state (m/l/acc scratch); Mosaic may
        # pipeline/reorder the rest freely
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(seed, q, k, v, bias)
    return res if need_lse else res[0]


def _bwd_local(q, k, v, bias, seed, g, lse, delta, dropout_rate, block_q,
               block_k, interpret):
    """The backward pallas_call(s) on (possibly per-shard local) shapes.
    Returns raw-dtype (dq, dk, dv); the caller casts."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    nq, nk = tq // block_q, tk // block_k
    hb = _heads_per_block(h)
    seed_spec, q_spec, kv_spec, bias_spec, row_spec = _specs(
        block_q, block_k, d, hb
    )

    if nk == 1:
        # whole K in one tile: a single combined sweep yields all three
        # gradients from ONE score recompute (the TFAM t<=512 train shapes)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_dqkv_single_kernel, scale=scale,
                              dropout_rate=dropout_rate, nk=nk, hb=hb),
            grid=(b, h // hb, nq),
            in_specs=[
                seed_spec,
                q_spec(lambda bi, hi, qi: (bi, hi, qi, 0)),
                kv_spec(lambda bi, hi, qi: (bi, hi, 0, 0)),
                kv_spec(lambda bi, hi, qi: (bi, hi, 0, 0)),
                bias_spec(lambda bi, hi, qi: (bi, 0, 0)),
                q_spec(lambda bi, hi, qi: (bi, hi, qi, 0)),    # dO
                row_spec(lambda bi, hi, qi: (bi, hi, 0, qi)),  # lse
                row_spec(lambda bi, hi, qi: (bi, hi, 0, qi)),  # delta
            ],
            out_specs=(
                q_spec(lambda bi, hi, qi: (bi, hi, qi, 0)),
                kv_spec(lambda bi, hi, qi: (bi, hi, 0, 0)),
                kv_spec(lambda bi, hi, qi: (bi, hi, 0, 0)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct(q.shape, q.dtype),
                jax.ShapeDtypeStruct(k.shape, jnp.float32),
                jax.ShapeDtypeStruct(v.shape, jnp.float32),
            ),
            # dk/dv accumulate across the q sweep (last dim)
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(seed, q, k, v, bias, g, lse, delta)
        return dq, dk, dv

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, dropout_rate=dropout_rate,
                          nk=nk, hb=hb),
        grid=(b, h // hb, nq, nk),
        in_specs=[
            seed_spec,
            q_spec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
            kv_spec(lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            kv_spec(lambda bi, hi, qi, ki: (bi, hi, ki, 0)),
            bias_spec(lambda bi, hi, qi, ki: (bi, 0, ki)),
            q_spec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),    # dO
            row_spec(lambda bi, hi, qi, ki: (bi, hi, 0, qi)),  # lse
            row_spec(lambda bi, hi, qi, ki: (bi, hi, 0, qi)),  # delta
        ],
        out_specs=q_spec(lambda bi, hi, qi, ki: (bi, hi, qi, 0)),
        # f32 accumulator like dk/dv: dq sums nk partials across the K
        # sweep — accumulating in bf16 would round every partial add
        out_shape=jax.ShapeDtypeStruct(q.shape, jnp.float32),
        # dq accumulates across the k sweep (last dim)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(seed, q, k, v, bias, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale,
                          dropout_rate=dropout_rate, nk=nk, hb=hb),
        grid=(b, h // hb, nk, nq),
        in_specs=[
            seed_spec,
            q_spec(lambda bi, hi, ki, qi: (bi, hi, qi, 0)),
            kv_spec(lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            kv_spec(lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            bias_spec(lambda bi, hi, ki, qi: (bi, 0, ki)),
            q_spec(lambda bi, hi, ki, qi: (bi, hi, qi, 0)),    # dO
            row_spec(lambda bi, hi, ki, qi: (bi, hi, 0, qi)),  # lse
            row_spec(lambda bi, hi, ki, qi: (bi, hi, 0, qi)),  # delta
        ],
        out_specs=(
            kv_spec(lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
            kv_spec(lambda bi, hi, ki, qi: (bi, hi, ki, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, jnp.float32),
            jax.ShapeDtypeStruct(v.shape, jnp.float32),
        ),
        # dk/dv accumulate across the q sweep (last dim)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(seed, q, k, v, bias, g, lse, delta)

    return dq, dk, dv


# ---------------------------------------------------------------------------
# GSPMD partitioning: the pallas calls are data-parallel over (batch, head),
# so under a sharded jit each device runs the SAME kernel on its local
# (b, h) slab — no all-gather, no replication. custom_partitioning tells
# the partitioner exactly that (Pallas calls otherwise carry no rule and
# would be gathered+replicated). The per-(row, head) dropout seeds make the
# kernel's random bits a function of the row's own seed, not its position
# in the local shard, so any sharding produces bit-identical results.
#
# AD cannot trace through custom_partitioning ("differentiation rule not
# implemented"), so the wrappers live INSIDE the custom_vjp rules, which
# are the only callers.
# ---------------------------------------------------------------------------


def _spec_of(sharding):
    from jax.sharding import PartitionSpec as P

    spec = getattr(sharding, "spec", None)
    return spec if spec is not None else P()


def _bh_axes(arg_shapes):
    """(batch_axis, head_axis) mesh axes suggested by q's sharding."""
    qs = _spec_of(arg_shapes[0].sharding)
    db = qs[0] if len(qs) > 0 else None
    dh = qs[1] if len(qs) > 1 else None
    return db, dh


def _fwd_arg_out_shardings(mesh, db, dh, need_lse):
    from jax.sharding import NamedSharding, PartitionSpec as P

    p4 = NamedSharding(mesh, P(db, dh, None, None))
    args = (
        p4,                                        # q
        p4,                                        # k
        p4,                                        # v
        NamedSharding(mesh, P(db, None, None)),    # bias
        NamedSharding(mesh, P(db, dh)),            # seed
    )
    outs = (p4, p4) if need_lse else p4
    return args, outs


def _make_fwd_part(need_lse):
    def fwd(q, k, v, bias, seed, dropout_rate, block_q, block_k, interpret):
        return _fwd_local(q, k, v, bias, seed, dropout_rate, block_q,
                          block_k, interpret, need_lse)

    wrapped = custom_partitioning(fwd, static_argnums=(5, 6, 7, 8))

    def infer(dropout_rate, block_q, block_k, interpret, mesh, arg_shapes,
              result_shape):
        db, dh = _bh_axes(arg_shapes)
        _, outs = _fwd_arg_out_shardings(mesh, db, dh, need_lse)
        return outs

    def partition(dropout_rate, block_q, block_k, interpret, mesh,
                  arg_shapes, result_shape):
        db, dh = _bh_axes(arg_shapes)
        args, outs = _fwd_arg_out_shardings(mesh, db, dh, need_lse)

        def lower(q, k, v, bias, seed):
            return _fwd_local(q, k, v, bias, seed, dropout_rate, block_q,
                              block_k, interpret, need_lse)

        return mesh, lower, outs, args

    rule = ("b h q d, b h k d, b h k d, b z k, b h -> b h q d, b h e q"
            if need_lse else
            "b h q d, b h k d, b h k d, b z k, b h -> b h q d")
    wrapped.def_partition(
        infer_sharding_from_operands=infer,
        partition=partition,
        sharding_rule=rule,
    )
    return wrapped


_fwd_part_lse = _make_fwd_part(need_lse=True)
_fwd_part_nolse = _make_fwd_part(need_lse=False)


def _bwd_part_fn(q, k, v, bias, seed, g, lse, delta, dropout_rate, block_q,
                 block_k, interpret):
    return _bwd_local(q, k, v, bias, seed, g, lse, delta, dropout_rate,
                      block_q, block_k, interpret)


_bwd_part = custom_partitioning(_bwd_part_fn, static_argnums=(8, 9, 10, 11))


def _bwd_infer(dropout_rate, block_q, block_k, interpret, mesh, arg_shapes,
               result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    db, dh = _bh_axes(arg_shapes)
    p4 = NamedSharding(mesh, P(db, dh, None, None))
    return (p4, p4, p4)


def _bwd_partition(dropout_rate, block_q, block_k, interpret, mesh,
                   arg_shapes, result_shape):
    from jax.sharding import NamedSharding, PartitionSpec as P

    db, dh = _bh_axes(arg_shapes)
    p4 = NamedSharding(mesh, P(db, dh, None, None))
    args = (
        p4, p4, p4,                                # q, k, v
        NamedSharding(mesh, P(db, None, None)),    # bias
        NamedSharding(mesh, P(db, dh)),            # seed
        p4,                                        # dO
        p4,                                        # lse (B,H,8,Tq)
        p4,                                        # delta
    )

    def lower(q, k, v, bias, seed, g, lse, delta):
        return _bwd_local(q, k, v, bias, seed, g, lse, delta, dropout_rate,
                          block_q, block_k, interpret)

    return mesh, lower, (p4, p4, p4), args


_bwd_part.def_partition(
    infer_sharding_from_operands=_bwd_infer,
    partition=_bwd_partition,
    sharding_rule=(
        "b h q d, b h k d, b h k d, b z k, b h, b h q d, b h e q, b h e q"
        " -> b h q d, b h k d, b h k d"
    ),
)


# ---------------------------------------------------------------------------
# custom-VJP core
# ---------------------------------------------------------------------------


def _fwd_dispatch(q, k, v, bias, seed, dropout_rate, block_q, block_k,
                  interpret, need_lse):
    """Partitioned path, except under the TPU-semantics interpreter
    (pltpu.InterpretParams — the CPU stub-dropout test mode), whose
    io-callback effects custom_partitioning cannot lower."""
    if isinstance(interpret, pltpu.InterpretParams):
        return _fwd_local(q, k, v, bias, seed, dropout_rate, block_q,
                          block_k, interpret, need_lse)
    part = _fwd_part_lse if need_lse else _fwd_part_nolse
    return part(q, k, v, bias, seed, dropout_rate, block_q, block_k,
                interpret)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8)
)
def _flash_core(q, k, v, bias, seed, dropout_rate, block_q, block_k, interpret):
    """Padded-shape core: q (B,H,Tq,D), k/v (B,H,Tk,D), bias (B,1,Tk),
    seed (B,H) int32 (one PRNG seed per row and head). As the custom_vjp
    PRIMAL this only runs when nothing differentiates through it — so it
    uses the lse-free forward."""
    return _fwd_dispatch(q, k, v, bias, seed, dropout_rate, block_q,
                         block_k, interpret, need_lse=False)


def _flash_fwd(q, k, v, bias, seed, dropout_rate, block_q, block_k, interpret):
    out, lse = _fwd_dispatch(
        q, k, v, bias, seed, dropout_rate, block_q, block_k, interpret,
        need_lse=True,
    )
    return out, (q, k, v, bias, seed, out, lse)


def _flash_bwd(dropout_rate, block_q, block_k, interpret, residuals, g):
    q, k, v, bias, seed, out, lse = residuals
    b, h, tq, _ = q.shape
    # D = rowsum(dO ∘ O): the softmax-backward correction term, invariant
    # under dropout (keep ∘ keep = keep). Broadcast over the 8-sublane row
    # layout the kernels read (see _specs).
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.broadcast_to(delta[:, :, None, :], (b, h, 8, tq))
    bwd = (_bwd_local if isinstance(interpret, pltpu.InterpretParams)
           else _bwd_part)
    dq, dk, dv = bwd(
        q, k, v, bias, seed, g, lse, delta, dropout_rate, block_q, block_k,
        interpret,
    )
    # bias derives from the (non-differentiable) padding mask; seed is int.
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(bias),
            np.zeros(seed.shape, dtype=jax.dtypes.float0))


_flash_core.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(
    jax.jit,
    static_argnames=("dropout_rate", "block_q", "block_k", "interpret"),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_padding_mask: jax.Array | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | None = None,
    block_q: int = 512,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jax.Array:
    """Masked attention, torch MHA numerics, online softmax over K blocks
    (no sequence-length VMEM cap), optional fused attention dropout.
    Differentiable (custom VJP with Pallas backward kernels).

    Args:
        q: (B, H, Tq, D) float32/bfloat16.
        k, v: (B, H, Tk, D).
        key_padding_mask: (B, Tk) bool, True = IGNORE key (torch convention).
        dropout_rate: attention-weight dropout probability. Bits come from
            the on-chip PRNG inside the kernel — nothing (Tq, Tk)-shaped is
            materialised. Requires ``dropout_seed``.
        dropout_seed: int32 seed(s) from the layer's dropout rng — a scalar
            (expanded to one decorrelated seed per (row, head) via
            ``_expand_seed``'s golden-ratio mix), or a (B,) per-row
            vector, or a (B, H) per-(row, head) matrix. The
            same seeds reproduce the same mask, fwd and bwd; because bits
            are keyed by each row/head's OWN seed, results are identical
            under any batch/head sharding.
        block_q, block_k: tile sizes (clamped to the padded sequence).

    Under a multi-device mesh the kernels partition over (batch, head) via
    custom_partitioning — each device runs the same program on its local
    slab, with no gather/replication and bit-identical outputs to the
    unsharded call.
    Returns:
        (B, H, Tq, D), dtype of q.
    """
    if interpret is None:
        if jax.default_backend() != "tpu" and dropout_rate > 0.0:
            # The interpreters stub the TPU PRNG (zero bits -> keep-all),
            # which would silently disable dropout AND inflate the output
            # by 1/(1-p). Refuse rather than mis-train; tests that
            # deliberately exercise the stubbed plumbing pass
            # interpret=True explicitly.
            raise RuntimeError(
                "fused attention dropout needs the TPU backend (the "
                "interpreter's stubbed PRNG would silently keep "
                "everything); use implementation='xla' off-TPU"
            )
        interpret = jax.default_backend() != "tpu"
    if interpret is True and dropout_rate > 0.0:
        # the generic interpreter has no lowering for the TPU PRNG
        # primitives; the TPU-semantics interpreter stubs them (zero bits)
        interpret = pltpu.InterpretParams()
    if not 0.0 <= dropout_rate < 1.0:
        # rate=1.0 would 0/0 the output normalisation (the XLA path returns
        # zeros there; a rate this high is always a config error)
        raise ValueError(
            f"dropout_rate must be in [0, 1); got {dropout_rate}"
        )
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    b, h, tq, d = q.shape
    tk = k.shape[2]

    # Pad to the tile grid; padded keys get masked out via the bias so
    # results are exact, padded q rows are sliced off. Block sizes are the
    # largest 128-multiples <= block_q/block_k that DIVIDE the 128-rounded
    # lengths, so no further length padding is ever added (tq=520 runs as
    # 640 = 5 x 128-tiles, not rounded up to one 1024 block).
    if block_q % 128 or block_k % 128 or block_q < 128 or block_k < 128:
        raise ValueError(
            f"block_q/block_k must be multiples of 128 (got {block_q}, "
            f"{block_k}) — TPU tiles are 128-lane"
        )
    tq_p = _round_up(tq, 128)
    tk_p = _round_up(tk, 128)
    bq = _largest_dividing_block(tq_p, block_q)
    bk = _largest_dividing_block(tk_p, block_k)
    if tq_p != tq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, tq_p - tq), (0, 0)))
    if tk_p != tk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, tk_p - tk), (0, 0)))

    if key_padding_mask is None:
        ignore = jnp.zeros((b, tk), dtype=bool)
    else:
        ignore = key_padding_mask
        if ignore.shape != (b, tk):
            raise ValueError(
                f"key_padding_mask must be (B, Tk) = {(b, tk)}; got "
                f"{ignore.shape}"
            )
    # user-masked keys get _MASK_VALUE, grid-padding keys the strictly
    # lower _PAD_VALUE (see constants above)
    bias = jnp.where(ignore, _MASK_VALUE, 0.0).astype(jnp.float32)
    bias = jnp.pad(bias, ((0, 0), (0, tk_p - tk)),
                   constant_values=_PAD_VALUE)[:, None, :]

    if dropout_seed is None:
        seed = jnp.zeros((b, h), jnp.int32)
    else:
        seed = _expand_seed(dropout_seed, b, h)

    out = _flash_core(q, k, v, bias, seed, float(dropout_rate), bq, bk,
                      interpret)
    return out[:, :, :tq, :]

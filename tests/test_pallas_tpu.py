"""Hardware-only Pallas kernel tests (compiled Mosaic, real TPU chip).

The CPU suite exercises the flash-attention kernels in interpreter mode,
where the TPU PRNG primitives are stubbed to zero bits (=> keep-everything
dropout). These tests validate what only the chip can: real
``pltpu.prng_random_bits`` randomness — keep-rate statistics, seed
determinism, and forward/backward mask bit-consistency — plus compiled
numerics vs a float64 oracle.

Run with ``make tpu-test`` (or ``pytest tests/test_pallas_tpu.py`` in an
environment whose default jax backend is TPU). Skipped automatically under
the CPU-pinned conftest used by ``make test``.

Reference dropout semantics under test: attention-weight dropout of
``torch.nn.MultiheadAttention(dropout=p)`` as used by the TFAM encoder,
/root/reference/TFAM/AMO_CLIP.py:19-28,35.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="compiled-Mosaic tests need the real TPU chip",
)


def _data(seed, b=2, h=4, tq=520, tk=470, d=64):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, h, tq, d))
    k = rng.standard_normal((b, h, tk, d))
    v = rng.standard_normal((b, h, tk, d))
    lens = rng.integers(1, tk + 1, size=b)
    ignore = np.arange(tk)[None, :] >= lens[:, None]
    return q, k, v, ignore


def _oracle(qn, kn, vn, ign):
    d = qn.shape[-1]
    s = np.einsum("bhqd,bhkd->bhqk", qn, kn) / np.sqrt(d)
    s = s + np.where(ign, -1e9, 0.0)[:, None, None, :]
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", p, vn)


def test_compiled_multiblock_matches_f64_oracle():
    """Compiled online-softmax forward within MXU rounding of a float64
    softmax (f32 inputs on TPU run bf16-pass matmuls at default precision,
    so the bound is ~1e-2 absolute on O(1) data — same order as XLA's own
    attention on this chip)."""
    from vimoclip_tpu.ops.attention import dot_product_attention
    from vimoclip_tpu.ops.pallas import flash_attention

    qn, kn, vn, ign = _data(0)
    oracle = _oracle(qn, kn, vn, ign)
    q, k, v = (jnp.asarray(x, jnp.float32) for x in (qn, kn, vn))
    ignore = jnp.asarray(ign)
    got = np.asarray(
        flash_attention(q, k, v, key_padding_mask=ignore,
                        block_q=128, block_k=128)
    )
    ref = np.asarray(dot_product_attention(q, k, v, key_padding_mask=ignore))
    err_flash = np.abs(got - oracle).max()
    err_xla = np.abs(ref - oracle).max()
    assert err_flash < max(1e-2, 4.0 * err_xla), (err_flash, err_xla)


def test_compiled_gradients_match_xla():
    from vimoclip_tpu.ops.attention import dot_product_attention
    from vimoclip_tpu.ops.pallas import flash_attention

    qn, kn, vn, ign = _data(1, tq=260, tk=300)
    q, k, v = (jnp.asarray(x, jnp.float32) for x in (qn, kn, vn))
    ignore = jnp.asarray(ign)

    def loss_xla(q, k, v):
        o = dot_product_attention(q, k, v, key_padding_mask=ignore)
        return jnp.sum(jnp.sin(o))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, key_padding_mask=ignore,
                            block_q=128, block_k=128)
        return jnp.sum(jnp.sin(o))

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_got):
        # both sides carry MXU rounding; compare against each other loosely
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-2, atol=5e-2)


def test_fused_dropout_keep_rate_and_scaling():
    """With v = ones, each output row is sum_j Pd_ij / (1-p) whose
    expectation over the dropout bits is exactly 1 — a direct statistical
    check that the on-chip PRNG keep rate is 1-p and the 1/(1-p) rescale is
    applied (reference semantics: torch F.dropout on attention weights)."""
    from vimoclip_tpu.ops.pallas import flash_attention

    qn, kn, _, ign = _data(2)
    q, k = jnp.asarray(qn, jnp.float32), jnp.asarray(kn, jnp.float32)
    ones_v = jnp.ones((k.shape[0], k.shape[1], k.shape[2], q.shape[3]),
                      jnp.float32)
    ignore = jnp.asarray(ign)
    p_drop = 0.3
    out = flash_attention(q, k, ones_v, key_padding_mask=ignore,
                          dropout_rate=p_drop,
                          dropout_seed=jnp.array([42], jnp.int32),
                          block_q=128, block_k=128)
    m = float(jnp.mean(out))
    assert abs(m - 1.0) < 0.02, m
    # and it actually drops: per-row values spread around 1
    sd = float(jnp.std(out))
    assert sd > 0.01, sd


def test_fused_dropout_seed_determinism():
    from vimoclip_tpu.ops.pallas import flash_attention

    qn, kn, vn, ign = _data(3, tq=256, tk=256)
    q, k, v = (jnp.asarray(x, jnp.float32) for x in (qn, kn, vn))
    ignore = jnp.asarray(ign)
    kw = dict(key_padding_mask=ignore, dropout_rate=0.25,
              block_q=128, block_k=128)
    a = flash_attention(q, k, v, dropout_seed=jnp.array([7], jnp.int32), **kw)
    b = flash_attention(q, k, v, dropout_seed=jnp.array([7], jnp.int32), **kw)
    c = flash_attention(q, k, v, dropout_seed=jnp.array([8], jnp.int32), **kw)
    assert bool(jnp.all(a == b)), "same seed must reproduce the same mask"
    assert not bool(jnp.all(a == c)), "different seed must change the mask"


def test_fused_dropout_fwd_bwd_bit_consistency():
    """The backward kernels RE-GENERATE the dropout bits from (seed, tile
    coords). If their stream diverged from forward's, the identity
    sum(d/dv sum(out) @ v=1) == sum(out at v=1) would break (both equal
    sum_ij Pd_ij / (1-p) only when fwd and bwd agree on the mask)."""
    from vimoclip_tpu.ops.pallas import flash_attention

    qn, kn, _, ign = _data(4)
    q, k = jnp.asarray(qn, jnp.float32), jnp.asarray(kn, jnp.float32)
    ones_v = jnp.ones((k.shape[0], k.shape[1], k.shape[2], q.shape[3]),
                      jnp.float32)
    ignore = jnp.asarray(ign)
    seed = jnp.array([99], jnp.int32)

    def s_flash(vv):
        return jnp.sum(
            flash_attention(q, k, vv, key_padding_mask=ignore,
                            dropout_rate=0.3, dropout_seed=seed,
                            block_q=128, block_k=128)
        )

    gv = jax.grad(s_flash)(ones_v)
    lhs = float(jnp.sum(gv))
    rhs = float(s_flash(ones_v))
    assert abs(lhs - rhs) < 1e-2 * abs(rhs), (lhs, rhs)


def test_bf16_production_dtype():
    from vimoclip_tpu.ops.attention import dot_product_attention
    from vimoclip_tpu.ops.pallas import flash_attention

    qn, kn, vn, ign = _data(5, tq=512, tk=512)
    q, k, v = (jnp.asarray(x, jnp.bfloat16) for x in (qn, kn, vn))
    ignore = jnp.asarray(ign)
    got = flash_attention(q, k, v, key_padding_mask=ignore)
    ref = dot_product_attention(q, k, v, key_padding_mask=ignore)
    assert got.dtype == jnp.bfloat16
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 5e-2, err

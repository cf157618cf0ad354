"""Pallas kernel parity tests (interpreter mode on CPU; the compiled path
runs on the real chip via bench/serving)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vimoclip_tpu.ops.attention import dot_product_attention
from vimoclip_tpu.ops.pallas import flash_attention, fused_normalize
from vimoclip_tpu.ops.preprocess import normalize


def _qkv(seed, b=2, h=4, tq=130, tk=97, d=64):
    rng = np.random.default_rng(seed)
    mk = lambda t: jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    return mk(tq), mk(tk), mk(tk)


def test_flash_attention_matches_xla_unmasked():
    q, k, v = _qkv(0)
    ref = dot_product_attention(q, k, v)
    got = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_attention_matches_xla_masked():
    q, k, v = _qkv(1)
    b, _, tk, _ = k.shape
    rng = np.random.default_rng(2)
    lens = rng.integers(1, tk + 1, size=b)
    ignore = jnp.asarray(np.arange(tk)[None, :] >= lens[:, None])
    ref = dot_product_attention(q, k, v, key_padding_mask=ignore)
    got = flash_attention(q, k, v, key_padding_mask=ignore, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_flash_attention_masked_keys_ignored():
    q, k, v = _qkv(3)
    tk = k.shape[2]
    ignore = jnp.asarray(np.arange(tk)[None, :] >= tk - 10)
    ignore = jnp.tile(ignore, (q.shape[0], 1))
    out1 = flash_attention(q, k, v, key_padding_mask=ignore, interpret=True)
    k2 = k.at[:, :, -10:, :].set(999.0)
    v2 = v.at[:, :, -10:, :].set(-999.0)
    out2 = flash_attention(q, k2, v2, key_padding_mask=ignore, interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_flash_attention_bf16():
    q, k, v = _qkv(4, tq=128, tk=128)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    ref = dot_product_attention(q, k, v)
    got = flash_attention(qb, kb, vb, interpret=True).astype(jnp.float32)
    cos = (np.asarray(got) * np.asarray(ref)).sum(-1) / (
        np.linalg.norm(np.asarray(got), axis=-1)
        * np.linalg.norm(np.asarray(ref), axis=-1)
    )
    assert cos.min() > 0.99


def test_fused_normalize_matches_reference():
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (3, 16, 24, 3), dtype=np.uint8)
    ref = np.asarray(normalize(jnp.asarray(imgs).astype(jnp.float32)))
    got = np.asarray(fused_normalize(jnp.asarray(imgs), interpret=True))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_fused_normalize_bf16_and_odd_rows():
    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 256, (5, 17, 23, 3), dtype=np.uint8)  # odd sizes
    ref = np.asarray(normalize(jnp.asarray(imgs).astype(jnp.float32)))
    got = np.asarray(
        fused_normalize(jnp.asarray(imgs), dtype=jnp.bfloat16, interpret=True)
    ).astype(np.float32)
    assert np.abs(got - ref).max() < 0.02  # bf16 rounding


def test_flash_attention_gradients_match_xla():
    """Custom-VJP backward kernel must match XLA autodiff grads."""
    q, k, v = _qkv(7, b=2, h=2, tq=70, tk=50, d=32)
    b, _, tk, _ = k.shape
    rng = np.random.default_rng(8)
    lens = rng.integers(5, tk + 1, size=b)
    ignore = jnp.asarray(np.arange(tk)[None, :] >= lens[:, None])

    def loss_xla(q, k, v):
        o = dot_product_attention(q, k, v, key_padding_mask=ignore)
        return jnp.sum(jnp.sin(o))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, key_padding_mask=ignore, interpret=True)
        return jnp.sum(jnp.sin(o))

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_flash_attention_grad_zero_at_masked_keys():
    q, k, v = _qkv(9, b=1, h=2, tq=16, tk=24, d=16)
    ignore = jnp.asarray(np.arange(24)[None, :] >= 20)

    def loss(k, v):
        o = flash_attention(q, k, v, key_padding_mask=ignore, interpret=True)
        return jnp.sum(o * o)

    dk, dv = jax.grad(loss, argnums=(0, 1))(k, v)
    # masked keys receive no gradient
    np.testing.assert_allclose(np.asarray(dk)[:, :, 20:, :], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv)[:, :, 20:, :], 0.0, atol=1e-6)
    assert float(jnp.abs(dk[:, :, :20]).max()) > 0

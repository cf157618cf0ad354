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


def test_flash_attention_multiblock_matches_xla():
    """Online-softmax K-blocking: forcing several q AND k tiles must be
    exact vs the single-shot XLA softmax (the lifted Tk-VMEM-cap path)."""
    q, k, v = _qkv(10, b=2, h=2, tq=300, tk=260, d=32)
    b, _, tk, _ = k.shape
    rng = np.random.default_rng(11)
    lens = rng.integers(1, tk + 1, size=b)
    ignore = jnp.asarray(np.arange(tk)[None, :] >= lens[:, None])
    ref = dot_product_attention(q, k, v, key_padding_mask=ignore)
    got = flash_attention(q, k, v, key_padding_mask=ignore,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_multiblock_gradients():
    """Backward (dq sweep + dkv sweep) across several q/k tiles matches XLA
    autodiff."""
    q, k, v = _qkv(12, b=1, h=2, tq=200, tk=150, d=32)
    ignore = jnp.asarray(np.arange(150)[None, :] >= 120)

    def loss_xla(q, k, v):
        o = dot_product_attention(q, k, v, key_padding_mask=ignore)
        return jnp.sum(jnp.sin(o))

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, key_padding_mask=ignore,
                            block_q=128, block_k=128, interpret=True)
        return jnp.sum(jnp.sin(o))

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_flash_attention_dropout_plumbing_interpret():
    """In-kernel dropout fwd+bwd plumbing on CPU: the interpreter stubs
    prng_random_bits to zeros, which the kernel's `bits < threshold` keep
    test maps to keep-EVERYTHING — so output must equal attention scaled by
    1/(1-p), and gradients must match that same fixed-mask reference
    (exercising the mask/scale paths of all three kernels; real bit
    randomness is validated on hardware, tests/test_pallas_tpu.py)."""
    p_drop = 0.25
    q, k, v = _qkv(13, b=1, h=2, tq=64, tk=80, d=32)
    ignore = jnp.asarray(np.arange(80)[None, :] >= 70)
    seed = jnp.array([123], jnp.int32)

    def fixed_mask_ref(q, k, v):
        return dot_product_attention(q, k, v, key_padding_mask=ignore) / (
            1.0 - p_drop
        )

    def flash_drop(q, k, v):
        return flash_attention(q, k, v, key_padding_mask=ignore,
                               dropout_rate=p_drop, dropout_seed=seed,
                               interpret=True)

    np.testing.assert_allclose(
        np.asarray(flash_drop(q, k, v)), np.asarray(fixed_mask_ref(q, k, v)),
        rtol=2e-5, atol=2e-5,
    )
    g_ref = jax.grad(lambda *a: jnp.sum(jnp.sin(fixed_mask_ref(*a))),
                     argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(lambda *a: jnp.sum(jnp.sin(flash_drop(*a))),
                     argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_flash_attention_dropout_requires_seed():
    q, k, v = _qkv(14, b=1, h=1, tq=16, tk=16, d=16)
    with pytest.raises(ValueError, match="dropout_seed"):
        flash_attention(q, k, v, dropout_rate=0.1, interpret=True)


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


def test_mha_auto_resolves_to_xla_off_tpu():
    """implementation='auto' off the TPU backend must bit-match the XLA
    path at any shape (auto never picks interpreter-mode flash)."""
    import flax.linen as nn  # noqa: F401
    from vimoclip_tpu.ops.attention import MultiHeadAttention

    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.standard_normal((2, 300, 64)), jnp.float32)
    kw = dict(embed_dim=64, num_heads=4, dropout=0.1)
    m_auto = MultiHeadAttention(**kw, implementation="auto")
    m_xla = MultiHeadAttention(**kw, implementation="xla")
    params = m_xla.init(jax.random.key(0), x)["params"]
    key = jax.random.key(3)
    out_auto = m_auto.apply({"params": params}, x, deterministic=False,
                            rngs={"dropout": key})
    out_xla = m_xla.apply({"params": params}, x, deterministic=False,
                          rngs={"dropout": key})
    np.testing.assert_array_equal(np.asarray(out_auto), np.asarray(out_xla))


def test_flash_attention_non_power_of_two_lengths():
    """tq=520/tk=460 exercise the divide-not-round block choice (640 = 5
    q-tiles of 128, 512 = 4 k-tiles — no length padding beyond the
    128-round-up) and must stay exact vs XLA."""
    from vimoclip_tpu.ops.pallas.flash_attention import _largest_dividing_block

    assert _largest_dividing_block(640, 512) == 128
    assert _largest_dividing_block(512, 512) == 512
    assert _largest_dividing_block(1024, 512) == 512
    assert _largest_dividing_block(768, 512) == 384
    assert _largest_dividing_block(128, 512) == 128

    q, k, v = _qkv(15, b=1, h=2, tq=520, tk=460, d=32)
    ignore = jnp.asarray(np.arange(460)[None, :] >= 450)
    ref = dot_product_attention(q, k, v, key_padding_mask=ignore)
    got = flash_attention(q, k, v, key_padding_mask=ignore, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_attention_dropout_refuses_stubbed_prng():
    """Auto-detected interpreter mode + dropout must refuse (the stubbed
    PRNG would silently keep everything and inflate by 1/(1-p)); explicit
    interpret=True remains the tests' escape hatch."""
    q, k, v = _qkv(16, b=1, h=1, tq=16, tk=16, d=16)
    with pytest.raises(RuntimeError, match="TPU backend"):
        flash_attention(q, k, v, dropout_rate=0.1,
                        dropout_seed=jnp.array([1], jnp.int32))


def test_keep_threshold_clamps_to_uint32():
    from vimoclip_tpu.ops.pallas.flash_attention import _keep_threshold

    assert _keep_threshold(1e-12) == 2**32 - 1
    assert _keep_threshold(0.5) == 2**31


def test_flash_attention_sharded_matches_unsharded(mesh8):
    """custom_partitioning: the kernel under a (data=4, model=2) mesh with
    q/k/v sharded over (batch, heads) must produce exactly the unsharded
    result — each device runs the same program on its local slab."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v = _qkv(30, b=4, h=2, tq=256, tk=256, d=32)
    ignore = jnp.asarray(
        np.broadcast_to(np.arange(256)[None, :] >= 200, (4, 256))
    )
    ref = flash_attention(q, k, v, key_padding_mask=ignore,
                          block_q=128, block_k=128, interpret=True)

    sh = NamedSharding(mesh8, P("data", "model", None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    got = jax.jit(
        lambda q, k, v: flash_attention(
            q, k, v, key_padding_mask=ignore,
            block_q=128, block_k=128, interpret=True,
        )
    )(qs, ks, vs)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_flash_attention_sharded_gradients_match(mesh8):
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v = _qkv(31, b=4, h=2, tq=128, tk=128, d=32)

    def loss(q, k, v):
        o = flash_attention(q, k, v, block_q=128, block_k=128,
                            interpret=True)
        return jnp.sum(jnp.sin(o))

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    sh = NamedSharding(mesh8, P("data", "model", None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    g_got = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qs, ks, vs)
    for a, b_ in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=1e-6, atol=1e-6)


def test_flash_attention_block_size_validation():
    q, k, v = _qkv(32, b=1, h=1, tq=16, tk=16, d=16)
    with pytest.raises(ValueError, match="128"):
        flash_attention(q, k, v, block_q=64, interpret=True)
    with pytest.raises(ValueError, match="128"):
        flash_attention(q, k, v, block_k=200, interpret=True)


def test_dropout_seed_expansion_decorrelates_consecutive_seeds():
    """Scalar seeds s and s+1 must not share any (seed value, tile) PRNG
    stream — asserted against the IMPLEMENTATION's expansion
    (flash_attention._expand_seed), so a regression to plain seed+arange
    fails here."""
    from vimoclip_tpu.ops.pallas.flash_attention import _expand_seed

    b, h = 4, 8
    for s in (0, 1, 123456):
        a = np.asarray(_expand_seed(jnp.int32(s), b, h)).reshape(-1)
        bb = np.asarray(_expand_seed(jnp.int32(s + 1), b, h)).reshape(-1)
        assert not set(a.tolist()) & set(bb.tolist()), s
    # (B,) per-row seeds one apart must also not collide across rows
    rows = jnp.arange(b, dtype=jnp.int32)
    expanded = np.asarray(_expand_seed(rows, b, h))
    assert expanded.shape == (b, h)
    assert len(set(expanded.reshape(-1).tolist())) == b * h
    # (B, H) passes through untouched
    full = jnp.arange(b * h, dtype=jnp.int32).reshape(b, h)
    np.testing.assert_array_equal(np.asarray(_expand_seed(full, b, h)),
                                  np.asarray(full))


def test_flash_attention_head_dim_128():
    """d_head=128 (full MXU lane width — larger models than the reference's
    64): fwd and grads exact vs XLA."""
    q, k, v = _qkv(33, b=1, h=2, tq=160, tk=140, d=128)
    ignore = jnp.asarray(np.arange(140)[None, :] >= 130)
    ref = dot_product_attention(q, k, v, key_padding_mask=ignore)
    got = flash_attention(q, k, v, key_padding_mask=ignore,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(
        lambda *a: jnp.sum(jnp.sin(
            dot_product_attention(*a, key_padding_mask=ignore))),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_got = jax.grad(
        lambda *a: jnp.sum(jnp.sin(flash_attention(
            *a, key_padding_mask=ignore, block_q=128, block_k=128,
            interpret=True))),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("seed", [40, 41, 42, 43, 44])
def test_flash_attention_random_shapes(seed):
    """Randomized shape sweep: odd lengths, uneven tq/tk, varying heads and
    head dims — every configuration must match XLA exactly (fwd)."""
    rng = np.random.default_rng(seed)
    b = int(rng.integers(1, 4))
    h = int(rng.integers(1, 5))
    tq = int(rng.integers(1, 400))
    tk = int(rng.integers(1, 400))
    d = int(rng.choice([16, 32, 64, 128]))
    q, k, v = _qkv(seed, b=b, h=h, tq=tq, tk=tk, d=d)
    lens = rng.integers(1, tk + 1, size=b)
    ignore = jnp.asarray(np.arange(tk)[None, :] >= lens[:, None])
    ref = dot_product_attention(q, k, v, key_padding_mask=ignore)
    got = flash_attention(q, k, v, key_padding_mask=ignore,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-5, atol=3e-5,
        err_msg=f"b={b} h={h} tq={tq} tk={tk} d={d}",
    )


def test_flash_attention_fully_masked_row_matches_xla():
    """A fully user-masked row must fall back to uniform attention over
    the REAL keys only (the XLA path's documented behavior) even when Tk
    is not a multiple of 128 — grid-padding keys carry a strictly lower
    bias than user-masked keys."""
    q, k, v = _qkv(50, b=2, h=2, tq=16, tk=130, d=16)
    ignore = jnp.ones((2, 130), dtype=bool)  # every key masked
    ref = dot_product_attention(q, k, v, key_padding_mask=ignore)
    got = flash_attention(q, k, v, key_padding_mask=ignore, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # and the uniform-over-real-keys value: mean of v over the 130 keys
    expect = np.asarray(jnp.mean(v, axis=2, keepdims=True))
    np.testing.assert_allclose(np.asarray(got),
                               np.broadcast_to(expect, got.shape),
                               rtol=2e-4, atol=2e-5)


def test_flash_attention_dropout_rate_validation():
    q, k, v = _qkv(51, b=1, h=1, tq=16, tk=16, d=16)
    seed = jnp.array([1], jnp.int32)
    with pytest.raises(ValueError, match="dropout_rate"):
        flash_attention(q, k, v, dropout_rate=1.0, dropout_seed=seed,
                        interpret=True)
    with pytest.raises(ValueError, match="dropout_rate"):
        flash_attention(q, k, v, dropout_rate=-0.1, dropout_seed=seed,
                        interpret=True)


def test_expand_seed_1x1_passthrough():
    from vimoclip_tpu.ops.pallas.flash_attention import _expand_seed

    m = jnp.array([[7]], jnp.int32)
    np.testing.assert_array_equal(np.asarray(_expand_seed(m, 1, 1)),
                                  np.asarray(m))

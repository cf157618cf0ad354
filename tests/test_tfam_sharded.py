"""End-to-end sharded TFAM step on the 8-virtual-device mesh: params
partitioned dp x tp, batch sharded on data, grads computed under jit —
validates the multi-chip compile path the driver dry-runs."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from vimoclip_tpu import losses
from vimoclip_tpu.config import TFAMModelConfig
from vimoclip_tpu.models import TFAM
from vimoclip_tpu.parallel import TFAM_PARTITION_RULES, batch_sharding, shard_params


def test_sharded_tfam_train_step(mesh8):
    cfg = TFAMModelConfig(d_model=64, nhead=4, num_layers=2, dim_feedforward=128)
    model = TFAM(config=cfg, num_classes=10)

    b, t = 8, 12
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.normal(size=(b, t, 64)).astype(np.float32))
    motion = jnp.asarray(rng.normal(size=(b, t - 1, 64)).astype(np.float32))
    mask_rgb = jnp.ones((b, t), dtype=bool)
    mask_flow = jnp.ones((b, t - 1), dtype=bool)
    labels = jnp.asarray((rng.random((b, 10)) < 0.2).astype(np.float32))

    params = model.init(jax.random.key(0), rgb, motion, mask_rgb, mask_flow)["params"]

    # Unsharded reference loss/grads
    def loss_fn(p, rgb, motion, mr, mf, y):
        logits = model.apply({"params": p}, rgb, motion, mr, mf, deterministic=True)
        return losses.bce_with_logits(logits, y)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(
        params, rgb, motion, mask_rgb, mask_flow, labels
    )

    # Shard: params via partition rules, batch over data axis
    sharded_params = shard_params(params, TFAM_PARTITION_RULES, mesh8)
    ffn_kernel = sharded_params["layers_0"]["ffn_dense1"]["kernel"]
    assert ffn_kernel.sharding.spec == P(None, "model")
    assert ffn_kernel.addressable_shards[0].data.shape == (64, 64)  # 128/2

    bs = batch_sharding(mesh8)
    args = [jax.device_put(a, bs) for a in (rgb, motion, mask_rgb, mask_flow, labels)]

    step = jax.jit(jax.value_and_grad(loss_fn))
    got_loss, got_grads = step(sharded_params, *args)

    assert abs(float(got_loss) - float(ref_loss)) < 1e-5
    flat_ref = jax.tree.leaves(ref_grads)
    flat_got = jax.tree.leaves(got_grads)
    for r, g in zip(flat_ref, flat_got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=5e-4, atol=1e-5)

    # One optimizer step under jit with sharded state
    tx = optax.adamw(1e-4, weight_decay=0.1)
    opt_state = tx.init(sharded_params)

    @jax.jit
    def update(p, o, *args):
        loss, grads = jax.value_and_grad(loss_fn)(p, *args)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    new_params, _, loss2 = update(sharded_params, opt_state, *args)
    # Param sharding preserved through the update
    assert (
        new_params["layers_0"]["ffn_dense1"]["kernel"].sharding.spec
        == P(None, "model")
    )
    assert np.isfinite(float(loss2))


def test_sharded_tfam_flash_attention_matches_unsharded(mesh8):
    """The Pallas flash path (attention_impl='flash') under the dp x tp
    mesh: custom_partitioning splits the kernel over (batch, heads), so
    sharded logits/grads must match the unsharded ones."""
    cfg = TFAMModelConfig(d_model=64, nhead=4, num_layers=2,
                          dim_feedforward=128, attention_impl="flash")
    model = TFAM(config=cfg, num_classes=10)

    b, t = 8, 12
    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.normal(size=(b, t, 64)).astype(np.float32))
    motion = jnp.asarray(rng.normal(size=(b, t - 1, 64)).astype(np.float32))
    mask_rgb = jnp.ones((b, t), dtype=bool)
    mask_flow = jnp.ones((b, t - 1), dtype=bool)
    labels = jnp.asarray((rng.random((b, 10)) < 0.2).astype(np.float32))

    params = model.init(jax.random.key(0), rgb, motion, mask_rgb, mask_flow)["params"]

    def loss_fn(p, rgb, motion, mr, mf, y):
        logits = model.apply({"params": p}, rgb, motion, mr, mf,
                             deterministic=True)
        return losses.bce_with_logits(logits, y)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(
        params, rgb, motion, mask_rgb, mask_flow, labels
    )

    sharded_params = shard_params(params, TFAM_PARTITION_RULES, mesh8)
    bs = batch_sharding(mesh8)
    args = [jax.device_put(a, bs) for a in (rgb, motion, mask_rgb, mask_flow, labels)]
    got_loss, got_grads = jax.jit(jax.value_and_grad(loss_fn))(
        sharded_params, *args
    )

    assert abs(float(got_loss) - float(ref_loss)) < 1e-5
    for r, g in zip(jax.tree.leaves(ref_grads), jax.tree.leaves(got_grads)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=5e-4, atol=1e-5)

"""Mesh and partitioning tests on the 8-virtual-device CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vimoclip_tpu.parallel import (
    MeshConfig,
    TFAM_PARTITION_RULES,
    batch_sharding,
    create_mesh,
    partition_params,
    shard_params,
)


def test_mesh_geometry(mesh8):
    assert mesh8.axis_names == ("data", "model")
    assert mesh8.devices.shape == (4, 2)


def test_mesh_config_validation():
    with pytest.raises(ValueError):
        MeshConfig(data_parallel=5, model_parallel=2).resolve(8)  # 10 > 8
    assert MeshConfig(-1, 2).resolve(8) == (4, 2)
    assert MeshConfig(-1, 1).resolve(1) == (1, 1)
    assert MeshConfig(3, 2).resolve(8) == (3, 2)  # subset mesh allowed


def test_subset_mesh(devices):
    mesh = create_mesh(MeshConfig(2, 1))
    assert mesh.devices.shape == (2, 1)


def test_batch_sharded_psum(mesh8):
    """A jit'ed mean over a data-sharded batch must equal the host mean —
    XLA inserts the cross-device reduction from the sharding alone."""
    x = np.arange(32 * 4, dtype=np.float32).reshape(32, 4)
    xs = jax.device_put(x, batch_sharding(mesh8))
    got = jax.jit(lambda a: jnp.mean(a))(xs)
    assert np.allclose(np.asarray(got), x.mean())


def test_partition_rules_tfam(mesh8):
    params = {
        "layers_0": {
            "ffn_dense1": {"kernel": jnp.zeros((512, 2048)), "bias": jnp.zeros(2048)},
            "ffn_dense2": {"kernel": jnp.zeros((2048, 512)), "bias": jnp.zeros(512)},
            "self_attn": {
                "qkv_proj": {"kernel": jnp.zeros((512, 1536))},
                "out_proj": {"kernel": jnp.zeros((512, 512))},
            },
            "norm_self": {"scale": jnp.zeros(512)},
        }
    }
    specs = TFAM_PARTITION_RULES.tree_specs(params)
    l0 = specs["layers_0"]
    assert l0["ffn_dense1"]["kernel"] == P(None, "model")
    assert l0["ffn_dense1"]["bias"] == P("model")
    assert l0["ffn_dense2"]["kernel"] == P("model", None)
    assert l0["ffn_dense2"]["bias"] == P()  # row-parallel bias replicated
    assert l0["self_attn"]["qkv_proj"]["kernel"] == P(None, "model")
    assert l0["self_attn"]["out_proj"]["kernel"] == P("model", None)
    assert l0["norm_self"]["scale"] == P()

    sharded = shard_params(params, TFAM_PARTITION_RULES, mesh8)
    k = sharded["layers_0"]["ffn_dense1"]["kernel"]
    assert isinstance(k.sharding, NamedSharding)
    assert k.sharding.spec == P(None, "model")
    # 2048 columns over model=2 -> 1024 per shard
    assert k.addressable_shards[0].data.shape == (512, 1024)


def test_partition_params_returns_shardings(mesh8):
    params = {"ffn_dense1": {"kernel": jnp.zeros((8, 16))}}
    sh = partition_params(params, TFAM_PARTITION_RULES, mesh8)
    assert isinstance(sh["ffn_dense1"]["kernel"], NamedSharding)


def test_local_batch_slice_single_process():
    from vimoclip_tpu.parallel import local_batch_slice

    s = local_batch_slice(32)
    assert s == slice(0, 32)  # single-process: the whole batch

"""Parameter partitioning rules: regex path -> PartitionSpec.

The reference shards nothing (DataParallel replicates, SURVEY.md §2.3). Here
every parameter pytree gets an explicit ``PartitionSpec`` so the same train
step compiles for 1 chip, a v5e-8 data-parallel slice, or a dp x tp mesh:

- TFAM FFN (d_model=512 -> dim_feedforward=2048) is the only wide matmul in
  the fusion model: column-parallel first projection, row-parallel second
  projection (Megatron layout — the pair needs a single psum which XLA
  inserts automatically from the shardings).
- Attention QKV/out projections shard over heads on ``model``.
- LayerNorms, biases of row-parallel layers, embeddings: replicated.

Rules are matched against '/'-joined flax param paths, first match wins,
default replicated.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vimoclip_tpu.parallel.mesh import MODEL_AXIS


class PartitionRules:
    def __init__(self, rules: list[tuple[str, P]]):
        self._rules = [(re.compile(pat), spec) for pat, spec in rules]

    def spec_for(self, path: str, ndim: int) -> P:
        for pat, spec in self._rules:
            if pat.search(path):
                if len(spec) > ndim:  # e.g. bias of a matched kernel rule
                    spec = P(*spec[-ndim:]) if ndim else P()
                return spec
        return P()

    def tree_specs(self, params: Any) -> Any:
        """PartitionSpec pytree mirroring ``params``."""

        def _spec(path, leaf):
            path_str = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path
            )
            return self.spec_for(path_str, leaf.ndim)

        return jax.tree_util.tree_map_with_path(_spec, params)


# TFAM (vimoclip_tpu.models.tfam.TFAM): flax linen param paths look like
#   params/layers_0/ffn_dense1/kernel  (512, 2048)
#   params/layers_0/ffn_dense2/kernel  (2048, 512)
#   params/layers_0/self_attn/qkv_proj/kernel (512, 1536)
#   params/layers_0/self_attn/out_proj/kernel (512, 512)
TFAM_PARTITION_RULES = PartitionRules(
    [
        (r"ffn_dense1/kernel", P(None, MODEL_AXIS)),
        (r"ffn_dense1/bias", P(MODEL_AXIS)),
        (r"ffn_dense2/kernel", P(MODEL_AXIS, None)),
        (r"(self_attn|cross_attn)/qkv_proj/kernel", P(None, MODEL_AXIS)),
        (r"(self_attn|cross_attn)/qkv_proj/bias", P(MODEL_AXIS)),
        (r"(self_attn|cross_attn)/(q_proj|k_proj|v_proj)/kernel", P(None, MODEL_AXIS)),
        (r"(self_attn|cross_attn)/(q_proj|k_proj|v_proj)/bias", P(MODEL_AXIS)),
        (r"(self_attn|cross_attn)/out_proj/kernel", P(MODEL_AXIS, None)),
    ]
)

# Student = CLIP ViT visual encoder + ResidualMLP + head. The ViT MLP
# (768 -> 3072) and attention shard over heads/ffn like TFAM's.
STUDENT_PARTITION_RULES = PartitionRules(
    [
        (r"mlp/fc1/kernel", P(None, MODEL_AXIS)),
        (r"mlp/fc1/bias", P(MODEL_AXIS)),
        (r"mlp/fc2/kernel", P(MODEL_AXIS, None)),
        (r"attn/qkv_proj/kernel", P(None, MODEL_AXIS)),
        (r"attn/qkv_proj/bias", P(MODEL_AXIS)),
        (r"attn/out_proj/kernel", P(MODEL_AXIS, None)),
    ]
)


def partition_params(params: Any, rules: PartitionRules, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``params`` under ``rules`` on ``mesh``."""
    specs = rules.tree_specs(params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(params: Any, rules: PartitionRules, mesh: Mesh) -> Any:
    """Place ``params`` onto ``mesh`` according to ``rules``."""
    shardings = partition_params(params, rules, mesh)
    return jax.device_put(params, shardings)

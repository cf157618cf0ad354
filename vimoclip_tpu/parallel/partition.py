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

    def unused_rules(self, params: Any) -> list[str]:
        """Rule patterns that match NO path in ``params`` — dead rules.

        Round-1 regression guard: STUDENT_PARTITION_RULES once carried
        ``mlp/fc1`` / ``qkv_proj`` patterns that matched nothing after module
        renames, silently replicating every student parameter (VERDICT.md
        round 1, weak #2). Tests assert this returns [] for each (rules,
        model) pair so a rename can never kill tensor parallelism quietly.
        """
        paths: list[str] = []

        def _collect(path, leaf):
            paths.append(
                "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            )
            return leaf

        jax.tree_util.tree_map_with_path(_collect, params)
        return [
            pat.pattern
            for pat, _ in self._rules
            if not any(pat.search(p) for p in paths)
        ]


# TFAM (vimoclip_tpu.models.tfam.TFAM): flax linen param paths look like
#   layers_0/ffn_dense1/kernel               (512, 2048)
#   layers_0/ffn_dense2/kernel               (2048, 512)
#   layers_0/self_attn/{q,k,v}_proj/kernel   (512, 512)  — separate projections
#   layers_0/self_attn/out_proj/kernel       (512, 512)
# (attention uses separate q/k/v projections, ops/attention.py — there is NO
# fused qkv_proj module; tests/test_parallel.py pins rules against real paths)
TFAM_PARTITION_RULES = PartitionRules(
    [
        (r"ffn_dense1/kernel", P(None, MODEL_AXIS)),
        (r"ffn_dense1/bias", P(MODEL_AXIS)),
        (r"ffn_dense2/kernel", P(MODEL_AXIS, None)),
        (r"(self_attn|cross_attn)/(q_proj|k_proj|v_proj)/kernel", P(None, MODEL_AXIS)),
        (r"(self_attn|cross_attn)/(q_proj|k_proj|v_proj)/bias", P(MODEL_AXIS)),
        (r"(self_attn|cross_attn)/out_proj/kernel", P(MODEL_AXIS, None)),
    ]
)

# Student = CLIP ViT visual encoder + ResidualMLP + head. Real paths
# (models/clip_vit.py ClipEncoderLayer, ops/attention.py MultiHeadAttention):
#   visual_encoder/layers_N/mlp_fc1/kernel               (768, 3072)
#   visual_encoder/layers_N/mlp_fc2/kernel               (3072, 768)
#   visual_encoder/layers_N/attn/{q,k,v}_proj/kernel     (768, 768)
#   visual_encoder/layers_N/attn/out_proj/kernel         (768, 768)
# Megatron layout: column-parallel fc1/qkv, row-parallel fc2/out. The small
# ResidualMLP (512x512) and heads stay replicated — sharding them buys
# nothing and the ``visual_encoder/`` anchor keeps them from matching.
STUDENT_PARTITION_RULES = PartitionRules(
    [
        (r"visual_encoder/.*mlp_fc1/kernel", P(None, MODEL_AXIS)),
        (r"visual_encoder/.*mlp_fc1/bias", P(MODEL_AXIS)),
        (r"visual_encoder/.*mlp_fc2/kernel", P(MODEL_AXIS, None)),
        (r"visual_encoder/.*attn/(q_proj|k_proj|v_proj)/kernel", P(None, MODEL_AXIS)),
        (r"visual_encoder/.*attn/(q_proj|k_proj|v_proj)/bias", P(MODEL_AXIS)),
        (r"visual_encoder/.*attn/out_proj/kernel", P(MODEL_AXIS, None)),
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

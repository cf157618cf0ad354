"""Device-mesh construction and sharding helpers.

The reference's entire parallelism story is single-process
``torch.nn.DataParallel`` over local GPUs (SURVEY.md §2.3; reference
train.py:64, TFAM/train_and_eval.py:392). The TPU-native replacement is a
``jax.sharding.Mesh`` over the ICI fabric:

- ``data`` axis: batch (data) parallelism — gradient all-reduce rides ICI via
  XLA-inserted ``psum`` when a pjit'ed train step consumes a
  ``P("data", ...)``-sharded batch.
- ``model`` axis: optional tensor parallelism for wide layers (the TFAM FFN is
  512x2048 — see ``vimoclip_tpu.parallel.partition``). d_model=512 makes TP
  unnecessary at v5e-8 scale, but the axis is first-class so the same code
  scales to larger fusion models and multi-host slices.

Multi-host (DCN) setup goes through ``initialize_distributed`` / standard
``jax.distributed``; per-host input sharding uses ``local_batch_slice``.
"""

from __future__ import annotations

import dataclasses
import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
# Sequence (context) parallelism axis: time sharded across devices for
# videos whose attention state outgrows one chip's HBM. Only present on the
# mesh when MeshConfig.seq_parallel > 1 (parallel/sequence.py ring attention).
SEQ_AXIS = "seq"
# Pipeline parallelism axis: transformer layers sharded into stages, GPipe
# microbatch schedule with activations rotated stage-to-stage via ppermute
# (parallel/pipelining.py). Only present when MeshConfig.pipeline_parallel > 1.
PIPE_AXIS = "pipe"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh geometry. ``data_parallel=-1`` means "all remaining devices"."""

    data_parallel: int = -1
    model_parallel: int = 1
    seq_parallel: int = 1
    pipeline_parallel: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        sp = max(1, self.seq_parallel)
        pp = max(1, self.pipeline_parallel)
        if n_devices % (sp * pp):
            raise ValueError(
                f"{n_devices} devices not divisible by seq={sp} x pipe={pp}"
            )
        avail = n_devices // (sp * pp)
        mp = max(1, self.model_parallel)
        dp = self.data_parallel
        if dp == -1:
            if avail % mp:
                raise ValueError(f"{avail} devices not divisible by model={mp}")
            dp = avail // mp
        if dp * mp * sp * pp > n_devices:
            raise ValueError(
                f"mesh {dp}x{pp}x{mp}x{sp} exceeds available device count "
                f"{n_devices}"
            )
        return dp, mp


def create_mesh(
    config: MeshConfig | None = None, devices: list | None = None
) -> Mesh:
    """Build a ``(data[, pipe], model[, seq])`` mesh over the devices.

    The base 2-D ``(data, model)`` mesh gains a ``pipe`` axis when
    ``pipeline_parallel > 1`` and a ``seq`` axis when ``seq_parallel > 1``;
    both are omitted otherwise so existing 2-D code sees the exact same
    mesh as before. On a single chip this degenerates to a 1x1 mesh, so
    every code path in the framework is mesh-aware with zero
    special-casing. A mesh smaller than the device count uses the first
    dp x pp x mp x sp devices (debug runs on a slice of the topology).
    """
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    dp, mp = config.resolve(len(devices))
    sp = max(1, config.seq_parallel)
    pp = max(1, config.pipeline_parallel)
    # axis order = collective locality: seq innermost (ring-attention
    # ppermute neighbours land on adjacent ICI links), model next (the
    # densest collectives), pipe between data and model (stage-to-stage
    # activation hops are the lightest traffic), data outermost.
    axes = [(DATA_AXIS, dp)]
    if pp > 1:
        axes.append((PIPE_AXIS, pp))
    axes.append((MODEL_AXIS, mp))
    if sp > 1:
        axes.append((SEQ_AXIS, sp))
    names = tuple(n for n, _ in axes)
    sizes = tuple(s for _, s in axes)
    n_used = int(np.prod(sizes))
    dev_array = np.asarray(devices[:n_used]).reshape(sizes)
    return Mesh(dev_array, axis_names=names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch-leading array: batch split over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host is responsible for feeding.

    Mirrors what the reference would need if it ever went multi-node; with
    DataParallel it never did (SURVEY.md §2.3).
    """
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(f"global batch {global_batch} % hosts {n_proc} != 0")
    per_host = global_batch // n_proc
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def commit_replicated(tree, mesh: Mesh):
    """Commit every leaf without a NamedSharding (fresh scalars, optimizer
    counters) as mesh-replicated, so restored checkpoints and fresh state
    share identical device placement (mixing committed single-device arrays
    with mesh-sharded ones fails under jit)."""
    rep = replicated_sharding(mesh)
    return jax.tree.map(
        lambda x: x
        if isinstance(getattr(x, "sharding", None), NamedSharding)
        else jax.device_put(x, rep),
        tree,
    )


def initialize_distributed() -> None:
    """Initialise multi-host JAX over DCN when launched under a cluster
    coordinator. No-op in single-process runs (the common case for v5e-8,
    which is a single host)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()

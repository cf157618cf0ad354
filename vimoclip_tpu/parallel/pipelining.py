"""Pipeline parallelism: GPipe microbatch schedule over a ``pipe`` mesh axis.

The reference has no pipeline parallelism of any kind — its entire
parallelism story is single-process ``torch.nn.DataParallel``
(SURVEY.md §2.3) — so, like ring attention (parallel/sequence.py), this is
scale-out headroom the TPU build adds: when a fusion model grows past one
chip's HBM *in parameters/activations along depth* (rather than along the
sequence axis), its layers shard into contiguous stages over the ``pipe``
mesh axis and microbatches stream through the stages.

Design — idiomatic JAX/TPU, not a port of GPipe's runtime:

- **Stacked stage params**: the per-stage parameter trees are stacked along
  a leading stage dim and sharded over ``pipe`` (one stage per device rank),
  so each device holds 1/n of the layer params — the actual memory win.
- **shard_map + ppermute ring**: one program runs on every stage;
  activations hop to the next stage with a single ``lax.ppermute`` per
  tick. ``M + n_stages - 1`` ticks total (the GPipe bubble); stage ``s``
  processes microbatch ``m`` at tick ``m + s``.
- **Autodiff IS the backward schedule**: ``ppermute``/``dynamic_slice``/
  ``scan`` all have transpose rules, so ``jax.grad`` of a pipelined loss
  yields the reverse pipeline automatically — no hand-written backward
  pass. Each tick is ``jax.checkpoint``-wrapped so the backward re-forms a
  tick's activations instead of storing all ``M + n - 1`` of them.
- **Bubble compute is masked, not branched**: warm-up/drain ticks compute
  garbage that is never written (selects gate the writes), which keeps the
  program a single static ``lax.scan`` — XLA-friendly control flow — and
  gives those ticks exactly zero gradient.

Composes with data parallelism: microbatches carry the batch dim sharded
over ``data`` (pass ``batch_axis``), gradient psums inserted by jit as
usual.

Dropout training (round 4, VERDICT r3 #2): pass ``stage_rng`` — each tick
derives its key as ``fold_in(base, stage, tick[, data_shard])``, so every
(stage, microbatch) pair gets an independent deterministic stream and the
``jax.checkpoint``-wrapped backward regenerates the same bits. Unlike ring
attention's global-coordinate scheme (parallel/sequence.py), the bit
stream here DOES depend on the mesh geometry (stage/shard indices key the
streams) — fine for dropout, whose stream is implementation-defined in
every stack (PARITY.md), but use the single-chip path for bit-level
repro studies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from vimoclip_tpu.parallel.mesh import PIPE_AXIS


def split_microbatches(tree, n_micro: int):
    """(B, ...) leaves -> (n_micro, B/n_micro, ...) microbatch leaves."""

    def split(x):
        if x.shape[0] % n_micro:
            raise ValueError(
                f"batch {x.shape[0]} not divisible by n_micro={n_micro}"
            )
        return x.reshape((n_micro, x.shape[0] // n_micro) + x.shape[1:])

    return jax.tree.map(split, tree)


def merge_microbatches(tree):
    """Inverse of :func:`split_microbatches`."""
    return jax.tree.map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), tree
    )


def stack_stage_params(layer_params: list, n_stages: int):
    """Stack per-layer param trees into (n_stages, layers_per_stage, ...).

    Layers must share one tree structure (true for the repeated transformer
    blocks this targets); consecutive layers go to the same stage.
    """
    n_layers = len(layer_params)
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by {n_stages} stages")
    per = n_layers // n_stages
    stages = [
        jax.tree.map(lambda *ls: jnp.stack(ls), *layer_params[s * per : (s + 1) * per])
        for s in range(n_stages)
    ]
    return jax.tree.map(lambda *ss: jnp.stack(ss), *stages)


def unstack_stage_params(stage_params) -> list:
    """Inverse of :func:`stack_stage_params`: back to a per-layer list."""
    leaves = jax.tree.leaves(stage_params)
    n_stages, per = leaves[0].shape[0], leaves[0].shape[1]
    return [
        jax.tree.map(lambda p: p[s, l], stage_params)
        for s in range(n_stages)
        for l in range(per)
    ]


def pipeline_apply(
    stage_fn,
    stage_params,
    microbatches,
    mesh: Mesh,
    *,
    pipe_axis: str = PIPE_AXIS,
    batch_axis: str | None = None,
    stage_rng: jax.Array | None = None,
    seq_axis: str | None = None,
):
    """Run ``stage_fn`` as a GPipe pipeline over ``mesh``'s ``pipe`` axis.

    Args:
        stage_fn: ``(one_stage_params, x) -> y`` — or, when ``stage_rng`` is
            given, ``(one_stage_params, x, rng) -> y`` — where ``x`` and
            ``y`` share ONE pytree structure with matching shapes/dtypes
            (the activation pytree that travels the pipeline — e.g.
            ``(x, motion, masks...)`` with pass-through leaves).
        stage_params: pytree whose leaves carry a leading ``n_stages`` dim
            (see :func:`stack_stage_params`); sharded over ``pipe_axis``.
        microbatches: activation pytree with leading ``(M, microbatch, ...)``
            dims; the microbatch dim may be sharded over ``batch_axis``.
        mesh: mesh containing ``pipe_axis`` (and ``batch_axis`` if given).
        stage_rng: optional base PRNG key enabling stochastic (dropout)
            stages — per-tick keys are ``fold_in(base, stage, tick[,
            data_shard][, seq_shard])`` (module docstring).
        seq_axis: optional mesh axis the activations' TIME dimension (axis
            2 of every ``(M, microbatch, T, ...)`` leaf) is sharded over —
            sequence parallelism INSIDE the pipeline stages. ``stage_fn``
            then sees local time shards and must do its attention with the
            inside-shard_map ring body (``attention_impl="ring_inner"``,
            ops/attention.py); everything elementwise over time needs no
            change. The seq shard index is folded into the per-tick rng so
            elementwise dropout decorrelates across time shards.

    Returns:
        Outputs with the same ``(M, microbatch, ...)`` layout, replicated
        over ``pipe_axis`` (a psum broadcast from the last stage).
    """
    if pipe_axis not in mesh.shape:
        raise ValueError(f"mesh {dict(mesh.shape)} has no {pipe_axis!r} axis")
    if seq_axis is not None and seq_axis not in mesh.shape:
        raise ValueError(f"mesh {dict(mesh.shape)} has no {seq_axis!r} axis")
    n = mesh.shape[pipe_axis]
    leaves = jax.tree.leaves(stage_params)
    if not leaves or any(leaf.shape[0] != n for leaf in leaves):
        raise ValueError(
            f"stage_params leading dim must equal the {pipe_axis!r} axis "
            f"size {n} (got {[leaf.shape[:1] for leaf in leaves[:3]]})"
        )

    def body(params, xs, rng=None):
        params = jax.tree.map(lambda p: jnp.squeeze(p, 0), params)  # my stage
        sid = lax.axis_index(pipe_axis)
        if rng is not None:
            rng = jax.random.fold_in(rng, sid)
            if batch_axis is not None:
                # decorrelate the data shards' dropout streams (they hold
                # DIFFERENT rows of the batch)
                rng = jax.random.fold_in(rng, lax.axis_index(batch_axis))
            if seq_axis is not None:
                # likewise the time shards (different positions of the same
                # rows). The ring-attention bits stay self-consistent — a
                # q-row's blocks are generated only by the shard owning the
                # row — but, like everything here, geometry-keyed (module
                # docstring).
                rng = jax.random.fold_in(rng, lax.axis_index(seq_axis))
        perm = [(i, (i + 1) % n) for i in range(n)]
        m_count = jax.tree.leaves(xs)[0].shape[0]

        # pcast: the zero inits are device-invariant literals, but the scan
        # carry becomes varying over pipe (and over whatever xs vary over,
        # e.g. data) after one tick — mark them varying up front so
        # shard_map's varying-axes check accepts the loop (same pattern as
        # parallel/sequence.py ring attention).
        target_vma = set(jax.typeof(jax.tree.leaves(xs)[0]).vma) | {pipe_axis}

        def varying(a):
            # pcast only the axes `a` does not already vary over (pcast
            # rejects already-varying names)
            missing = tuple(sorted(target_vma - set(jax.typeof(a).vma)))
            return lax.pcast(a, missing, to="varying") if missing else a
        state0 = jax.tree.map(lambda x: varying(jnp.zeros_like(x[0])), xs)
        outs0 = jax.tree.map(lambda x: varying(jnp.zeros_like(x)), xs)

        def tick(carry, t):
            state, outs = carry
            mb_idx = jnp.clip(t, 0, m_count - 1)
            mb = jax.tree.map(
                lambda x: varying(
                    lax.dynamic_index_in_dim(x, mb_idx, 0, keepdims=False)
                ),
                xs,
            )
            # stage 0 consumes fresh microbatches; later stages consume the
            # activation their predecessor rotated in last tick
            x_in = jax.tree.map(
                lambda a, b: jnp.where(sid == 0, a, b), mb, state
            )
            if rng is None:
                y = stage_fn(params, x_in)
            else:
                # stage sid processes microbatch t - sid at tick t, so
                # fold_in(rng, t) gives each (stage, microbatch) pair its
                # own deterministic stream (regenerated by the checkpointed
                # backward)
                y = stage_fn(params, x_in, jax.random.fold_in(rng, t))
            # the LAST stage finishes microbatch t-(n-1) at tick t; warm-up
            # and drain ticks (and every other stage) write nothing
            out_idx = jnp.clip(t - (n - 1), 0, m_count - 1)
            write = (sid == n - 1) & (t >= n - 1)
            outs = jax.tree.map(
                lambda os, yy: lax.dynamic_update_index_in_dim(
                    os,
                    jnp.where(
                        write,
                        yy,
                        lax.dynamic_index_in_dim(os, out_idx, 0, keepdims=False),
                    ),
                    out_idx,
                    0,
                ),
                outs,
                y,
            )
            state = jax.tree.map(lambda yy: lax.ppermute(yy, pipe_axis, perm), y)
            return (state, outs), None

        # remat per tick: backward re-forms a tick's activations instead of
        # storing M+n-1 of them
        (_, outs), _ = lax.scan(
            jax.checkpoint(tick), (state0, outs0), jnp.arange(m_count + n - 1)
        )
        # outputs live on the last stage only (zeros elsewhere): psum is a
        # broadcast-from-last over the pipe ring (bool leaves via int32)
        def bcast(o):
            if o.dtype == jnp.bool_:
                return lax.psum(o.astype(jnp.int32), pipe_axis).astype(bool)
            return lax.psum(o, pipe_axis)

        return jax.tree.map(bcast, outs)

    params_spec = P(pipe_axis)
    # (M, microbatch, T, ...) — time sharded over seq_axis when composed
    xs_spec = (P(None, batch_axis, seq_axis) if seq_axis is not None
               else P(None, batch_axis))
    if stage_rng is not None:
        return jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(params_spec, xs_spec, P()),
            out_specs=xs_spec,
        )(stage_params, microbatches, stage_rng)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(params_spec, xs_spec),
        out_specs=xs_spec,
    )(stage_params, microbatches)


def tfam_cross_pipeline_logits(
    params,
    config,
    mesh: Mesh,
    rgb_emb,
    motion_emb,
    mask_rgb=None,
    mask_flow=None,
    *,
    n_micro: int | None = None,
    pipe_axis: str = PIPE_AXIS,
    batch_axis: str | None = None,
    seq_axis: str | None = None,
    dtype=jnp.float32,
    dropout_rng: jax.Array | None = None,
):
    """The flagship TFAM forward (cross-attention fusion) with its encoder
    layers pipelined over ``pipe_axis``.

    Bit-matches ``TFAM.apply(..., deterministic=True)`` for the
    cross-attention mode (/root/reference/TFAM/models/AMO_CLIP.py:146-150
    semantics: queries = RGB stream, keys/values = the ORIGINAL motion
    embeddings at every layer): the stage function applies the REAL
    ``models.tfam.AttentionLayer`` modules with the model's own params, and
    the pre/post logic (PE, mask inversion, reference-exact unmasked
    pooling, classifier head) reuses the model's named head params — parity
    is pinned by tests/test_pipeline_parallel.py against ``TFAM.apply``.

    ``params`` is a trained/initialized TFAM param tree; layers are stacked
    into ``mesh.shape[pipe_axis]`` stages (consecutive layers per stage).
    ``n_micro`` defaults to the number of stages (the minimum that keeps
    every stage busy outside the bubble).

    ``dropout_rng`` enables TRAINING mode: the config's dropout /
    mlp_dropout apply inside the pipelined stages (per-(stage, microbatch)
    keys, see :func:`pipeline_apply`) and the classifier head — the full
    reference recipe (dropout 0.1, cfg_AK/config_default.yaml) trains
    pipelined. Omit it for the deterministic bit-parity forward.

    ``seq_axis`` composes SEQUENCE parallelism inside the pipeline stages
    (round 4): activations enter the pipe shard_map with their time
    dimension sharded over that mesh axis, and every stage's
    self/cross-attention runs the inside-shard_map ring body
    (``attention_impl="ring_inner"``) — K/V blocks rotate the seq ring
    while microbatch activations hop the pipe ring. Depth beyond one
    chip's HBM *and* time beyond one chip's HBM, on one mesh, dropout
    included. T and Tm must divide the seq axis size (length buckets
    already produce such shapes).
    """
    import flax.linen as nn

    from vimoclip_tpu.models.tfam import (
        _LN_EPS,
        AttentionLayer,
        sinusoidal_positional_encoding,
    )

    cfg = config
    if not cfg.use_cross_attention or cfg.use_only_rgb or cfg.use_only_flow:
        raise ValueError(
            "tfam_cross_pipeline_logits pipelines the cross-attention "
            "fusion mode; other modes run single-chip (or ring) paths"
        )
    n_stages = mesh.shape[pipe_axis]
    n_micro = n_micro or n_stages

    # --- prologue (models/tfam.py lines: PE add, mask inversion) ---
    if cfg.use_pe:
        rgb_emb = rgb_emb + sinusoidal_positional_encoding(
            rgb_emb.shape[1], cfg.d_model
        )[None].astype(rgb_emb.dtype)
        motion_emb = motion_emb + sinusoidal_positional_encoding(
            motion_emb.shape[1], cfg.d_model
        )[None].astype(motion_emb.dtype)
    b, t = rgb_emb.shape[:2]
    attn_rgb = (
        jnp.zeros((b, t), bool) if mask_rgb is None else ~mask_rgb
    )
    attn_flow = (
        jnp.zeros((b, motion_emb.shape[1]), bool)
        if mask_flow is None
        else ~mask_flow
    )

    # --- pipelined encoder ---
    if seq_axis is not None:
        n_seq = mesh.shape[seq_axis]
        if t % n_seq or motion_emb.shape[1] % n_seq:
            raise ValueError(
                f"T={t}, Tm={motion_emb.shape[1]} must divide the "
                f"{seq_axis!r} axis size {n_seq} — pad to a bucket first"
            )
    layer_mod = AttentionLayer(
        cfg.d_model,
        cfg.nhead,
        cfg.dim_feedforward,
        dropout=cfg.dropout,
        activation=cfg.activation,
        # dense attention on this device's full time when time is
        # unsharded; the inside-shard_map ring body when the seq axis
        # shards it (ops/attention.py "ring_inner")
        attention_impl="xla" if seq_axis is None else "ring_inner",
        seq_batch_axis=batch_axis if seq_axis is not None else None,
        head_proj=cfg.head_proj,  # honor the configured scheduling knob
        dtype=dtype,
    )
    stage_params = stack_stage_params(
        [params[f"layers_{i}"] for i in range(cfg.num_layers)], n_stages
    )

    per_stage = cfg.num_layers // n_stages

    def stage_fn(stage_p, xin, rng=None):
        x, mot, a_rgb, a_flow = xin

        def one_layer(x, scanned):
            lp, layer_idx = scanned
            if rng is None:
                out = layer_mod.apply(
                    {"params": lp},
                    x,
                    cross_src=mot,
                    src_key_padding_mask=a_rgb,
                    cross_key_padding_mask=a_flow,
                    deterministic=True,
                )
            else:
                out = layer_mod.apply(
                    {"params": lp},
                    x,
                    cross_src=mot,
                    src_key_padding_mask=a_rgb,
                    cross_key_padding_mask=a_flow,
                    deterministic=False,
                    rngs={"dropout": jax.random.fold_in(rng, layer_idx)},
                )
            return out, None

        x, _ = lax.scan(
            one_layer, x, (stage_p, jnp.arange(per_stage, dtype=jnp.int32))
        )
        return (x, mot, a_rgb, a_flow)

    micro = split_microbatches((rgb_emb, motion_emb, attn_rgb, attn_flow), n_micro)
    stage_rng = None
    if dropout_rng is not None:
        dropout_rng, stage_rng = jax.random.split(dropout_rng)
    out = pipeline_apply(
        stage_fn, stage_params, micro, mesh,
        pipe_axis=pipe_axis, batch_axis=batch_axis, stage_rng=stage_rng,
        seq_axis=seq_axis,
    )
    x = merge_microbatches(out)[0]

    # --- reference-exact unmasked pooling + head (models/tfam.py) ---
    if mask_rgb is None:
        limit = jnp.asarray(t, jnp.int32)
    else:
        limit = jnp.minimum(jnp.max(jnp.sum(mask_rgb.astype(jnp.int32), axis=1)), t)
    if cfg.masked_pooling and mask_rgb is not None:
        m = mask_rgb[..., None].astype(x.dtype)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1.0)
    else:
        inc = (jnp.arange(t) < limit)[None, :, None].astype(x.dtype)
        pooled = jnp.sum(x * inc, axis=1) / jnp.maximum(limit, 1).astype(x.dtype)

    class _Head(nn.Module):
        """TFAM's classifier head with the model's own param names."""

        @nn.compact
        def __call__(self, pooled, deterministic=True):
            h = nn.LayerNorm(epsilon=_LN_EPS, name="classifier_norm")(
                pooled.astype(jnp.float32)
            )
            h = nn.Dense(cfg.d_model // 2, name="classifier_dense1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dropout(cfg.mlp_dropout, deterministic=deterministic)(h)
            num_classes = params["classifier_dense2"]["kernel"].shape[1]
            return nn.Dense(num_classes, name="classifier_dense2")(h)

    head_params = {
        k: params[k]
        for k in ("classifier_norm", "classifier_dense1", "classifier_dense2")
    }
    if dropout_rng is not None:
        return _Head().apply(
            {"params": head_params}, pooled, deterministic=False,
            rngs={"dropout": dropout_rng},
        )
    return _Head().apply({"params": head_params}, pooled)

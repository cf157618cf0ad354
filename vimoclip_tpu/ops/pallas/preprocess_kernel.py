"""Pallas TPU kernel: fused uint8 -> CLIP-normalised float conversion.

The extraction pipeline's non-matmul cost is bandwidth: every decoded uint8
frame must become ``(x/255 - mean)/std`` floats before the ViT patchify
matmul. This kernel performs the rescale+normalise (and optional bf16
downcast) in one VMEM pass — one HBM read of uint8, one HBM write of the
target dtype, nothing materialised in between. (XLA usually fuses this chain
too; the kernel guarantees it and serves as the mandated Pallas hot-op for
the preprocessing path, reference student_model.py:77-78.)

Layout: operates on (N, 128k)-shaped flattened pixel blocks; the wrapper
handles reshaping (..., 3) images with per-channel constants by pre-scaling
into a channel-broadcast table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vimoclip_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD


def _normalize_kernel(x_ref, sub_ref, mul_ref, o_ref):
    # Mosaic has no direct uint8->f32 cast; reinterpret as int8 and undo the
    # two's-complement wrap (x in [128, 255] reads as x - 256).
    xi = pltpu.bitcast(x_ref[:], jnp.int8).astype(jnp.float32)
    x = jnp.where(xi < 0, xi + 256.0, xi)
    o_ref[:] = ((x - sub_ref[:]) * mul_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "block_rows", "interpret"))
def fused_normalize(
    images: jax.Array,
    mean=CLIP_MEAN,
    std=CLIP_STD,
    dtype: jnp.dtype = jnp.float32,
    block_rows: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """(..., H, W, 3) uint8 -> normalised ``dtype``, fused in one pass.

    Equivalent to ``preprocess.normalize(images.astype(f32))`` then cast.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    shape = images.shape
    if shape[-1] != 3:
        raise ValueError(f"expected trailing channel dim 3, got {shape}")
    h, w = shape[-3], shape[-2]
    n = 1
    for s in shape[:-3]:
        n *= s
    # rows = image rows across the batch; cols = W*3 pixels (channel-minor)
    x = images.reshape(n * h, w * 3)
    sub = jnp.tile(jnp.asarray(mean, jnp.float32) * 255.0, w)[None, :]
    mul = jnp.tile(1.0 / (jnp.asarray(std, jnp.float32) * 255.0), w)[None, :]

    rows = x.shape[0]
    block_rows = min(block_rows, rows)
    pad = (-rows) % block_rows
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    grid = (x.shape[0] // block_rows,)

    out = pl.pallas_call(
        _normalize_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, w * 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w * 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, w * 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        interpret=interpret,
    )(x, sub, mul)
    return out[:rows].reshape(shape[:-3] + (h, w, 3))

"""Dynamic int8 quantized matmuls for the inference-only forward paths.

The v5e MXU executes int8xint8->int32 dot products at ~2x its bf16 rate
(394 vs ~197 TOPS peak), and the teacher-extraction forward is matmul-bound
(85% of step time in the jax.profiler trace, docs/PERF.md). This module is
the opt-in lever that taps that second gear:

- **per-token dynamic activation quantization**: each row (token) of the
  activation matrix is scaled symmetrically to int8 by its own absmax —
  computed on the fly inside the jit, no calibration pass needed;
- **per-output-channel weight quantization**: each kernel column gets its
  own absmax scale (the standard recipe that keeps post-LayerNorm
  transformer numerics intact, e.g. LLM.int8()/SmoothQuant lineage);
- the matmul itself is one ``lax.dot_general`` with int8 operands and
  ``preferred_element_type=int32`` — XLA:TPU lowers this to the MXU's
  int8 path — followed by a fused f32 rescale (outer product of the two
  scale vectors) and bias add.

This is an *approximation* of the f32/bf16 matmul and therefore strictly
opt-in (``ClipVisionConfig.matmul_quant="int8"``, ``extract-embeddings
--quantize int8``): the reference pipeline (extract_embeddings.py:94) and
all parity surfaces stay in f32/bf16 by default. Quantization error is
pinned by tests (tests/test_quant.py) at the op level (exact match against
an integer-emulation oracle) and end-to-end (embedding cosine similarity
through a full ViT encoder). Training paths never use this module — the
straight-through estimator questions don't arise.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_EPS = 1e-12


def quantize_absmax(
    x: jax.Array, axes: int | tuple[int, ...] = -1
) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 quantization with one scale per slice along ``axes``.

    Returns ``(q, scale)`` with ``q`` int8 and ``scale`` f32 shaped like
    ``x`` with ``axes`` reduced (keepdims). ``x * 1`` is recovered as
    ``q.astype(f32) * scale`` up to rounding. Math runs in f32 regardless of
    input dtype (bf16 inputs would lose mantissa bits during the divide).
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, _EPS) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def quantize_rowwise(x: jax.Array, axis: int = -1) -> tuple[jax.Array, jax.Array]:
    """``quantize_absmax`` with a single reduction axis (the common case)."""
    return quantize_absmax(x, axis)


def int8_dynamic_matmul(
    x: jax.Array,
    kernel: jax.Array,
    *,
    out_dtype: jnp.dtype | None = None,
) -> jax.Array:
    """``x @ kernel`` via dynamically quantized int8 on the MXU.

    Args:
        x: (..., K) activations (any float dtype).
        kernel: (K, N) float weights.
        out_dtype: output dtype (default: ``x.dtype``).

    Per-row activation scales x per-column weight scales; accumulation in
    int32, rescale in f32.
    """
    if kernel.ndim != 2 or x.shape[-1] != kernel.shape[0]:
        raise ValueError(f"shape mismatch: x {x.shape} @ kernel {kernel.shape}")
    xq, xs = quantize_rowwise(x, axis=-1)          # (..., K) int8, (..., 1) f32
    wq, ws = quantize_rowwise(kernel, axis=0)      # (K, N) int8, (1, N) f32
    acc = lax.dot_general(
        xq,
        wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (xs * ws)        # broadcast outer rescale
    return y.astype(out_dtype or x.dtype)


class Int8Dense(nn.Module):
    """Drop-in ``nn.Dense`` replacement running its matmul in dynamic int8.

    Parameter layout is IDENTICAL to ``nn.Dense`` (f32 ``kernel`` (K, N) +
    optional ``bias`` (N,)), so converted torch/HF/OpenAI checkpoints load
    unchanged and the partition rules in vimoclip_tpu.parallel keep
    applying; only the forward compute is quantized (weights re-quantize
    inside the jit — one elementwise pass over the kernel, ~0.1% of the
    matmul's FLOPs at the ViT's batch sizes).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            self.param_dtype,
        )
        y = int8_dynamic_matmul(x, kernel, out_dtype=jnp.float32)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias
        return y.astype(self.dtype)


def make_dense(quant: str | None):
    """Dense-layer factory: ``None`` -> ``nn.Dense``, ``"int8"`` -> Int8Dense.

    The single switch the encoder modules key off (models/clip_vit.py,
    ops/attention.py); unknown values fail loudly at module-construction
    time rather than deep inside a jit trace.
    """
    if quant is None or quant == "none":
        return nn.Dense
    if quant == "int8":
        return Int8Dense
    raise ValueError(f"unknown matmul_quant {quant!r} (None | 'int8')")

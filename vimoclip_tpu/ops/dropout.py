"""HBM-thin dropout: 8-bit random masks instead of 32-bit.

``jax.random.bernoulli`` draws one uint32 per element; on a t=512 TFAM
train step the five per-layer elementwise dropouts (two residual + the
reference's triple-FFN quirk, AMO_CLIP.py:25-28) amount to ~256 MB of
random bits written+read through HBM per step. Drawing uint8 bits cuts
that traffic 4x — measured ~0.5 ms/step on the v5e recipe, closing the
train step to within noise of the dropouts-off bound (docs/PERF.md).

Semantics: keep probability is quantized to ceil/round((1-p)*256)/256
(max deviation 1/512 ~ 0.2%); the rescale uses the EXACT quantized keep
probability, so E[dropout(x)] == x holds exactly (unbiased), only the
regularization strength shifts by <0.2% of p. The bit STREAM differs from
``nn.Dropout``'s, which is already implementation-defined here (the
trainers default to the rbg generator, TrainingConfig.dropout_rng_impl;
the reference's stream is torch's).

``Dropout`` is a drop-in replacement for ``flax.linen.Dropout`` for the
rates used in this project (0 <= rate < 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def thin_dropout(
    x: jax.Array, rate: float, rng: jax.Array
) -> jax.Array:
    """Functional 8-bit-mask dropout; unbiased (exact quantized rescale).

    Quantization rounds to the nearest 1/256 (deviation <= 1/512): rates
    below ~1/512 become exact no-ops, rates within 1/512 of 1 drop
    everything (flax ``nn.Dropout(rate=1.0)`` semantics).
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"dropout rate must be in [0, 1]; got {rate}")
    if rate <= 0.0:
        return x
    thr = int(round((1.0 - rate) * 256.0))
    if thr >= 256:  # rate < 1/512: nearest representable keep-prob is 1
        return x
    if thr <= 0:  # rate > 1 - 1/512: nearest representable keep-prob is 0
        return jnp.zeros_like(x)
    keep_prob = thr / 256.0
    bits = jax.random.bits(rng, x.shape, dtype=jnp.uint8)
    scaled = x / jnp.asarray(keep_prob, x.dtype)
    return jnp.where(bits < jnp.uint8(thr), scaled, jnp.zeros_like(x))


class Dropout(nn.Module):
    """flax.linen.Dropout-compatible module over ``thin_dropout``."""

    rate: float
    rng_collection: str = "dropout"
    deterministic: bool | None = None

    @nn.compact
    def __call__(
        self, x: jax.Array, deterministic: bool | None = None
    ) -> jax.Array:
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate == 0.0:
            return x
        return thin_dropout(x, self.rate, self.make_rng(self.rng_collection))

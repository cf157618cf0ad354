"""Token merging (ToMe) for the ViT encoder — opt-in algorithmic speedup.

Video frames are spatially redundant: many of a ViT's 196 patch tokens
carry near-duplicate content (sky, fur, water). Token merging (Bolya et
al., "Token Merging: Your ViT But Faster", ICLR 2023 — public method;
the retrieved efficiency papers in PAPERS.md attack the same redundancy
along time) reduces the token count by a FIXED ``r`` after every encoder
block via bipartite soft matching, cutting block FLOPs roughly in half at
r=16 on ViT-B/16 with a sub-point accuracy cost in the paper's ImageNet
setting.

TPU-first: the whole reduction is static-shape — ``r`` is a Python
constant, every layer compiles at its own fixed token count, the
merge itself is argmax + argsort + two small one-hot einsums (MXU work,
no gather/scatter with dynamic extents) — exactly the kind of
"data-dependent compute" that is usually dynamic-shaped, restructured so
XLA can compile it.

Variant notes vs the paper (documented, since this is opt-in anyway):
- the matching metric is the block's OUTPUT hidden state (the paper's
  ablation table also evaluates this; attention keys score slightly
  better but would need the shared MHA module to grow a side output);
- merging happens at block boundaries (paper: between attn and MLP);
- no proportional attention (paper: matters mainly at aggressive r).

Like ``--dedup-threshold`` (temporal redundancy), this changes outputs
and is therefore strictly opt-in: ``ClipVisionConfig.token_merge_r`` /
``extract-embeddings --token-merge R``. Mechanism is pinned exactly by
tests/test_tome.py (numpy oracle); the accuracy trade on a real
checkpoint is the user's call, per the paper's published curves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bipartite_merge(
    x: jax.Array,
    sizes: jax.Array,
    r: int,
    protect_first: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """One ToMe step: (B, N, C) -> (B, N - r, C) by merging ``r`` tokens.

    Tokens (minus the protected CLS at index 0) split alternately into
    sets A (odd positions) and B (even positions); each A-token is scored
    against its most cosine-similar B-token, the ``r`` best-matched
    A-tokens are folded into their matches by size-weighted mean, and the
    rest are kept. ``sizes`` (B, N) tracks how many original tokens each
    current token represents (weighted-mean bookkeeping across steps).

    Output token order: [CLS] + B set (with merges applied) + kept A
    tokens. A transformer is permutation-equivariant past the (already
    added) position embeddings, and CLIP pools CLS only, so the reorder
    is semantics-free; CLS stays at index 0.
    """
    b, n, c = x.shape
    start = 1 if protect_first else 0
    na = (n - start) // 2          # A = odd offsets (merge candidates)
    nb = (n - start) - na          # B = even offsets (merge targets)
    if r <= 0:
        return x, sizes
    if r > na:
        raise ValueError(f"r={r} exceeds the {na} merge candidates of n={n}")

    cls_x, cls_s = x[:, :start], sizes[:, :start]
    body_x, body_s = x[:, start:], sizes[:, start:]
    xb, xa = body_x[:, 0::2], body_x[:, 1::2]      # (B, Nb, C), (B, Na, C)
    sb, sa = body_s[:, 0::2], body_s[:, 1::2]

    norm = lambda t: t / jnp.maximum(
        jnp.linalg.norm(t.astype(jnp.float32), axis=-1, keepdims=True), 1e-6
    )
    scores = jnp.einsum(
        "bac,bkc->bak", norm(xa), norm(xb)
    )                                               # (B, Na, Nb) cosine
    best = jnp.max(scores, axis=-1)                 # (B, Na)
    dst = jnp.argmax(scores, axis=-1)               # (B, Na) target in B

    # the r best-matched A tokens merge; the rest are kept — argsort gives
    # both halves with static shapes
    order = jnp.argsort(-best, axis=-1)             # (B, Na)
    merged_idx, kept_idx = order[:, :r], order[:, r:]

    take = lambda t, idx: jnp.take_along_axis(
        t, idx[..., None] if t.ndim == 3 else idx, axis=1
    )
    xa_m = take(xa, merged_idx)                     # (B, r, C)
    sa_m = take(sa, merged_idx)                     # (B, r)
    dst_m = take(dst, merged_idx)                   # (B, r)

    # fold merged A tokens into their B targets: size-weighted mean via a
    # one-hot einsum (static, MXU-friendly; several A's may share one B)
    onehot = jax.nn.one_hot(dst_m, nb, dtype=jnp.float32)    # (B, r, Nb)
    w_m = sa_m.astype(jnp.float32)
    num = (
        xb.astype(jnp.float32) * sb.astype(jnp.float32)[..., None]
        + jnp.einsum("brk,brc->bkc", onehot, xa_m.astype(jnp.float32) * w_m[..., None])
    )
    den = sb.astype(jnp.float32) + jnp.einsum("brk,br->bk", onehot, w_m)
    xb_new = (num / den[..., None]).astype(x.dtype)

    xa_k = take(xa, kept_idx)
    sa_k = take(sa, kept_idx)
    out_x = jnp.concatenate([cls_x, xb_new, xa_k], axis=1)
    out_s = jnp.concatenate(
        [cls_s, den.astype(sizes.dtype), sa_k], axis=1
    )
    return out_x, out_s


def merge_schedule(n_tokens: int, n_layers: int, r: int,
                   protect_first: bool = True, min_tokens: int = 8) -> list[int]:
    """Per-layer-boundary r values: constant ``r`` clamped so the token
    count never drops below ``min_tokens`` and never exceeds the available
    merge candidates (ToMe's constant schedule)."""
    out = []
    n = n_tokens
    start = 1 if protect_first else 0
    for _ in range(n_layers - 1):   # no merge after the final block
        na = (n - start) // 2
        step = max(0, min(r, na, n - min_tokens))
        out.append(step)
        n -= step
    return out

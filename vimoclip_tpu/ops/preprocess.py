"""On-device image/video preprocessing.

The reference preprocesses *per frame on the host*: PIL resize + center-crop
+ normalize inside the model's forward (student_model.py:77-78) or via HF
``CLIPImageProcessor`` in the extraction loop (extract_embeddings.py:89-93),
and generates motion frames offline with OpenCV (utils/generate_*). On TPU
that entire chain becomes a handful of fused XLA ops over a whole
(B*T, H, W, 3) uint8 batch living in HBM:

- ``clip_preprocess``: uint8 NHWC -> resized (bicubic, antialiased — PIL
  parity) -> center-cropped -> rescaled 1/255 -> CLIP-normalised float.
- ``frame_diff``: BT.601 grayscale absolute difference of consecutive frames
  (parity with utils/generate_frame_diff_video.py:37-49), replicated to 3
  channels the way a saved grayscale video decodes back (SURVEY.md L1).

Everything is static-shape and jit-compatible; a Pallas fused
normalise+diff kernel lives in vimoclip_tpu.ops.pallas for the
bandwidth-bound tail.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - import guard exercised by the fallback test
    # Private jax internals, pinned by test_preprocess fused-path tests: the
    # exact weight matrices jax.image.resize contracts with. If a future jax
    # moves them, clip_preprocess falls back to resize+crop (same numerics,
    # ~44% more resize FLOPs on the cropped axis).
    from jax._src.image.scale import ResizeMethod as _ResizeMethod
    from jax._src.image.scale import _kernels as _resize_kernels
    from jax._src.image.scale import compute_weight_mat as _compute_weight_mat

    _HAVE_WEIGHT_MAT = True
except Exception:  # pragma: no cover
    _HAVE_WEIGHT_MAT = False

# OpenAI CLIP normalization constants (student_model preprocess /
# CLIPImageProcessor for openai/clip-vit-*).
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

# ITU-R BT.601 luma weights used by cv2.cvtColor(..., COLOR_*2GRAY).
_BT601 = (0.299, 0.587, 0.114)


def resize_shortest_edge(
    images: jax.Array, size: int, method: str = "bicubic"
) -> jax.Array:
    """Resize so the shortest edge equals ``size`` (PIL/torchvision
    ``Resize(size)`` semantics: the long edge scales proportionally,
    rounded)."""
    b, h, w, c = images.shape
    if h <= w:
        new_h, new_w = size, max(size, int(round(w * size / h)))
    else:
        new_h, new_w = max(size, int(round(h * size / w))), size
    return jax.image.resize(
        images.astype(jnp.float32), (b, new_h, new_w, c), method=method,
        antialias=True,
    )


def center_crop(images: jax.Array, size: int) -> jax.Array:
    """Center crop to (size, size) — torchvision/HF semantics: the crop
    window starts at round((dim - size) / 2)."""
    _, h, w, _ = images.shape
    if h < size or w < size:
        raise ValueError(f"cannot center-crop {h}x{w} to {size}")
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return images[:, top : top + size, left : left + size, :]


def normalize(images: jax.Array, mean=CLIP_MEAN, std=CLIP_STD) -> jax.Array:
    """(x/255 - mean) / std for float images already in [0, 255]."""
    mean = jnp.asarray(mean, dtype=jnp.float32) * 255.0
    std = jnp.asarray(std, dtype=jnp.float32) * 255.0
    return (images - mean) / std


@functools.lru_cache(maxsize=32)
def _crop_resize_weights(h: int, w: int, size: int):
    """Static (host-side) weight matrices for resize-shortest-edge +
    center-crop, with the crop folded into the resize.

    The bicubic antialiased resize is a separable linear map (one weight
    matrix per axis — exactly how jax.image.resize lowers, via
    ``compute_weight_mat``), so center-cropping its output equals slicing
    the long axis' weight-matrix COLUMNS, and input rows with all-zero
    weights (the pixels the crop never samples) can be sliced off before
    the contraction. At the pipeline's 360x640 -> 224 geometry this removes
    ~44% of the resize FLOPs and ~43% of the resized pixels' HBM traffic
    (extraction trace, docs/PERF.md).

    Returns ((wh, h0, h1), (ww, w0, w1)) per axis: weight matrix (or None
    for a no-op axis) over the input window [x0, x1).
    """
    if h <= w:
        new_h, new_w = size, max(size, int(round(w * size / h)))
    else:
        new_h, new_w = max(size, int(round(h * size / w))), size
    kernel = _resize_kernels[_ResizeMethod.CUBIC]

    def axis(m: int, n: int) -> tuple[np.ndarray | None, int, int]:
        if m == n == size:
            return None, 0, m
        # shapes are static, so the weights are compile-time constants —
        # ensure_compile_time_eval keeps them concrete even when the first
        # call happens inside a jit/scan trace (lru_cache then serves every
        # later trace)
        with jax.ensure_compile_time_eval():
            mat = np.asarray(
                _compute_weight_mat(m, n, n / m, 0.0, kernel, True), np.float32
            )
        if n != size:  # fold the center crop into the columns
            lo = int(round((n - size) / 2.0))
            mat = mat[:, lo : lo + size]
        nz = np.nonzero(np.abs(mat).sum(axis=1))[0]
        x0, x1 = int(nz[0]), int(nz[-1]) + 1
        return mat[x0:x1], x0, x1

    return axis(h, new_h), axis(w, new_w)


def clip_preprocess(
    frames: jax.Array, image_size: int = 224, dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """Full CLIP preprocessing for a uint8 NHWC frame batch.

    Equivalent of the reference's per-frame PIL chain
    (Resize(224, BICUBIC) -> CenterCrop(224) -> ToTensor -> Normalize), run
    as one fused XLA program over the whole batch. Returns (B, S, S, 3)
    ``dtype`` images ready for ClipVisionEncoder.

    The resize+crop runs crop-aware (``_crop_resize_weights``): identical
    weights to jax.image.resize, crop folded in, never computing the pixels
    the crop discards (max |delta| vs the compositional path is ~2e-3 in
    0..255 units — einsum contraction-order rounding, far inside the PIL
    parity tolerance; pinned by tests).

    Contraction precision follows ``dtype``: when the caller asks for bf16
    output (every hot path — extraction, student train, serving feed the
    encoder in bf16), the resize einsum runs bf16-in/bf16-out at default
    precision — a single MXU pass (the MXU accumulates partials in f32
    internally; only the weights' bf16 rounding, ~0.4% relative, plus one
    bf16 output rounding enter — and a resize row has only ~4 nonzero
    taps, so accumulation-order error is negligible). The f32-``highest``
    path (6-pass f32 emulation, what jax.image.resize defaults to) is kept
    for f32 output — the numerical-parity surface. Measured on the chip:
    student train step 69.3 -> 68.2 ms, extraction batch 39.7 -> 38.9 ms
    (docs/PERF.md ledger #14). bf16-out (rather than f32-accumulate-out)
    is also what the CPU executor supports, so the CI parity test runs
    this exact path.
    """
    if not _HAVE_WEIGHT_MAT:  # pragma: no cover - jax-internals fallback
        x = resize_shortest_edge(frames, image_size)
        x = center_crop(x, image_size)
        return normalize(x).astype(dtype)

    (wh, h0, h1), (ww, w0, w1) = _crop_resize_weights(
        frames.shape[1], frames.shape[2], image_size
    )
    if jnp.dtype(dtype) == jnp.bfloat16:
        cdtype, precision = jnp.bfloat16, "default"
    else:
        # matches jax.image.resize's default (HIGHEST)
        cdtype, precision = jnp.float32, "highest"
    x = frames[:, h0:h1, w0:w1, :].astype(cdtype)
    cast = lambda m: jnp.asarray(m, dtype=cdtype)
    if wh is not None and ww is not None:
        x = jnp.einsum(
            "bhwc,hH,wW->bHWc", x, cast(wh), cast(ww), precision=precision
        )
    elif wh is not None:
        x = jnp.einsum("bhwc,hH->bHwc", x, cast(wh), precision=precision)
    elif ww is not None:
        x = jnp.einsum("bhwc,wW->bhWc", x, cast(ww), precision=precision)
    return normalize(x).astype(dtype)


def rgb_to_gray(frames: jax.Array) -> jax.Array:
    """BT.601 luma, uint8-rounded like cv2.cvtColor: (B, H, W, 3) -> (B, H, W)."""
    w = jnp.asarray(_BT601, dtype=jnp.float32)
    gray = jnp.einsum("bhwc,c->bhw", frames.astype(jnp.float32), w)
    return jnp.clip(jnp.round(gray), 0, 255).astype(jnp.uint8)


def frame_diff(frames: jax.Array, replicate_channels: bool = True) -> jax.Array:
    """Grayscale absolute frame difference.

    Args:
        frames: (T, H, W, 3) uint8 RGB frames of one clip.
    Returns:
        (T-1, H, W, 3) uint8 if ``replicate_channels`` (what a saved
        single-channel video decodes back as), else (T-1, H, W).

    Parity: cv2 absdiff of BT.601 grayscale consecutive frames
    (utils/generate_frame_diff_video.py:37-49).
    """
    gray = rgb_to_gray(frames).astype(jnp.int16)
    diff = jnp.abs(gray[1:] - gray[:-1]).astype(jnp.uint8)
    if replicate_channels:
        diff = jnp.repeat(diff[..., None], 3, axis=-1)
    return diff


def clip_preprocess_video(
    video: jax.Array, image_size: int = 224, dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """(T, H, W, 3) uint8 video -> (T, S, S, 3) preprocessed frames."""
    return clip_preprocess(video, image_size, dtype)

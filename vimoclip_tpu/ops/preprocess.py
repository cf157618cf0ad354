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

import jax
import jax.numpy as jnp

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


def clip_preprocess(
    frames: jax.Array, image_size: int = 224, dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """Full CLIP preprocessing for a uint8 NHWC frame batch.

    Equivalent of the reference's per-frame PIL chain
    (Resize(224, BICUBIC) -> CenterCrop(224) -> ToTensor -> Normalize), run
    as one fused XLA program over the whole batch. Returns (B, S, S, 3)
    ``dtype`` images ready for ClipVisionEncoder.
    """
    x = resize_shortest_edge(frames, image_size)
    x = center_crop(x, image_size)
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

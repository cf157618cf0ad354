"""Parity tests for on-device preprocessing vs the reference's host-side
tools: HF CLIPImageProcessor (PIL bicubic) and OpenCV gray/absdiff."""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vimoclip_tpu.ops.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    center_crop,
    clip_preprocess,
    frame_diff,
    normalize,
    resize_shortest_edge,
    rgb_to_gray,
)


def _smooth_image(seed, h=360, w=640):
    rng = np.random.default_rng(seed)
    low = rng.integers(0, 256, (h // 30, w // 32, 3)).astype(np.uint8)
    return cv2.resize(low, (w, h), interpolation=cv2.INTER_CUBIC).astype(np.uint8)


def test_clip_preprocess_matches_hf_processor():
    from transformers import CLIPImageProcessor

    proc = CLIPImageProcessor(crop_size=224, size={"shortest_edge": 224})
    img = _smooth_image(0)
    ref = proc(images=[img], return_tensors="np")["pixel_values"][0]  # (3,224,224)
    got = np.asarray(clip_preprocess(img[None]))[0].transpose(2, 0, 1)
    assert np.abs(ref - got).mean() < 0.01
    assert np.abs(ref - got).max() < 0.1  # PIL vs XLA bicubic edge effects


def test_resize_shortest_edge_geometry():
    img = np.zeros((2, 360, 640, 3), dtype=np.uint8)
    out = resize_shortest_edge(jnp.asarray(img), 224)
    assert out.shape == (2, 224, 398, 3)  # round(640*224/360)=398
    tall = np.zeros((1, 640, 360, 3), dtype=np.uint8)
    assert resize_shortest_edge(jnp.asarray(tall), 224).shape == (1, 398, 224, 3)


def test_center_crop_offsets():
    x = jnp.arange(5 * 6, dtype=jnp.float32).reshape(1, 5, 6, 1)
    out = center_crop(x, 4)
    # top=round(0.5)=0 (banker's) -> rows 0..3; left=round(1.0)=1 -> cols 1..4
    np.testing.assert_array_equal(
        np.asarray(out)[0, :, :, 0], np.asarray(x)[0, 0:4, 1:5, 0]
    )
    with pytest.raises(ValueError):
        center_crop(x, 7)


def test_normalize_formula():
    x = jnp.full((1, 2, 2, 3), 255.0)
    out = np.asarray(normalize(x))
    expect = (1.0 - np.asarray(CLIP_MEAN)) / np.asarray(CLIP_STD)
    np.testing.assert_allclose(out[0, 0, 0], expect, rtol=1e-5)


def test_rgb_to_gray_matches_cv2():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (4, 48, 64, 3), dtype=np.uint8)
    got = np.asarray(rgb_to_gray(jnp.asarray(img)))
    ref = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in img])
    # cv2 uses fixed-point arithmetic; allow off-by-one on rounding boundaries
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1


def test_frame_diff_matches_cv2():
    rng = np.random.default_rng(2)
    vid = rng.integers(0, 256, (5, 32, 40, 3), dtype=np.uint8)
    got = np.asarray(frame_diff(jnp.asarray(vid), replicate_channels=False))
    gray = np.stack([cv2.cvtColor(f, cv2.COLOR_RGB2GRAY) for f in vid])
    ref = np.stack([cv2.absdiff(gray[i + 1], gray[i]) for i in range(4)])
    assert got.shape == (4, 32, 40)
    # gray off-by-one can make diff off by up to 2
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 2
    assert (got.astype(int) != ref.astype(int)).mean() < 0.02

    rep = np.asarray(frame_diff(jnp.asarray(vid)))
    assert rep.shape == (4, 32, 40, 3)
    np.testing.assert_array_equal(rep[..., 0], got)
    np.testing.assert_array_equal(rep[..., 1], got)


def test_preprocess_then_encoder_embedding_parity():
    """End-to-end: uint8 frames -> on-device preprocess -> ClipVisionEncoder
    vs HF processor -> HF CLIP. Embedding cosine must be ~1."""
    import torch
    from transformers import CLIPImageProcessor, CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
    from vimoclip_tpu.models.clip_convert import clip_vision_params_from_hf

    torch.manual_seed(3)
    hf_cfg = HFConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=224, patch_size=32, projection_dim=32,
    )
    hf = CLIPVisionModelWithProjection(hf_cfg).eval()
    proc = CLIPImageProcessor(crop_size=224, size={"shortest_edge": 224})

    frames = np.stack([_smooth_image(s) for s in range(3)])
    with torch.no_grad():
        px = proc(images=list(frames), return_tensors="pt")["pixel_values"]
        ref = hf(px).image_embeds.numpy()

    cfg = ClipVisionConfig(
        image_size=224, patch_size=32, hidden_size=64, num_layers=2,
        num_heads=4, intermediate_size=128, projection_dim=32,
    )
    params = clip_vision_params_from_hf(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg
    )
    pixels = clip_preprocess(jnp.asarray(frames))
    got = np.asarray(ClipVisionEncoder(cfg).apply({"params": params}, pixels))

    cos = (ref * got).sum(-1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1)
    )
    assert cos.min() > 0.9995, cos


@pytest.mark.parametrize(
    "hw",
    [(360, 640), (640, 360), (100, 80), (224, 224), (224, 300), (301, 513)],
)
def test_clip_preprocess_crop_aware_matches_compositional(hw):
    """The crop-aware fused resize (weight-matrix column slicing +
    nonzero-input windowing, docs/PERF.md) must reproduce the compositional
    resize -> center-crop -> normalize path: identical geometry, values
    within einsum contraction-order rounding (~2e-3 of 0..255 before
    normalization -> ~3e-5 after)."""
    h, w = hw
    rng = np.random.default_rng(h * 1000 + w)
    frames = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)

    ref = normalize(
        center_crop(resize_shortest_edge(jnp.asarray(frames), 224), 224)
    )
    got = clip_preprocess(jnp.asarray(frames))
    assert got.shape == (2, 224, 224, 3)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-4


def test_clip_preprocess_jit_and_dtype():
    frames = np.zeros((1, 360, 640, 3), dtype=np.uint8)
    out = jax.jit(lambda f: clip_preprocess(f, 224, jnp.bfloat16))(
        jnp.asarray(frames)
    )
    assert out.dtype == jnp.bfloat16 and out.shape == (1, 224, 224, 3)


@pytest.mark.parametrize("hw", [(360, 640), (100, 80), (224, 300)])
def test_clip_preprocess_bf16_fast_path_matches_f32(hw):
    """bf16 output requests take the single-MXU-pass bf16 contraction
    (docs/PERF.md ledger #14); only the resize weights' bf16 rounding
    (~0.4% relative) separates it from the f32-`highest` parity path —
    inputs are exact in bf16 (uint8 <= 255) and the MXU accumulates in
    f32. Normalized units: std ~0.27 -> bound ~0.03."""
    h, w = hw
    rng = np.random.default_rng(h * 7 + w)
    frames = jnp.asarray(
        rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
    )
    ref = np.asarray(clip_preprocess(frames, 224, jnp.float32))
    got = np.asarray(clip_preprocess(frames, 224, jnp.bfloat16)).astype(
        np.float32
    )
    assert np.abs(ref - got).max() < 0.05, np.abs(ref - got).max()


# ---------------------------------------------------------------------------
# thin (8-bit-mask) dropout — ops/dropout.py
# ---------------------------------------------------------------------------


def test_thin_dropout_statistics_and_unbiasedness():
    from vimoclip_tpu.ops.dropout import thin_dropout

    rate = 0.1
    x = jnp.ones((256, 1024), jnp.float32)
    out = np.asarray(thin_dropout(x, rate, jax.random.key(0)))
    kept = out > 0
    # keep rate ~ quantized keep prob 230/256, binomial tolerance
    q = round((1 - rate) * 256) / 256
    assert abs(kept.mean() - q) < 0.005, (kept.mean(), q)
    # unbiased: mean of output equals mean of input (exact quantized rescale)
    assert abs(out.mean() - 1.0) < 0.01, out.mean()
    # kept entries all equal 1/q exactly
    np.testing.assert_allclose(out[kept], 1.0 / q, rtol=1e-6)


def test_thin_dropout_module_deterministic_and_zero_rate():
    from vimoclip_tpu.ops.dropout import Dropout

    x = jnp.arange(12.0).reshape(3, 4)
    m = Dropout(0.5)
    out_det = m.apply({}, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out_det), np.asarray(x))
    m0 = Dropout(0.0)
    out0 = m0.apply({}, x, deterministic=False, rngs={"dropout": jax.random.key(1)})
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))
    # same rng -> same mask; different rng -> different mask
    m5 = Dropout(0.5)
    a = m5.apply({}, x, deterministic=False, rngs={"dropout": jax.random.key(2)})
    b = m5.apply({}, x, deterministic=False, rngs={"dropout": jax.random.key(2)})
    c = m5.apply({}, x, deterministic=False, rngs={"dropout": jax.random.key(3)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_thin_dropout_gradient_matches_mask():
    from vimoclip_tpu.ops.dropout import thin_dropout

    x = jnp.asarray(np.random.default_rng(5).standard_normal((64, 64)),
                    jnp.float32)
    key = jax.random.key(7)
    out, vjp = jax.vjp(lambda x: thin_dropout(x, 0.3, key), x)
    (gx,) = vjp(jnp.ones_like(out))
    # gradient is the same scaled mask applied to ones
    ref = np.asarray(thin_dropout(jnp.ones_like(x), 0.3, key))
    np.testing.assert_allclose(np.asarray(gx), ref, rtol=1e-6)


def test_thin_dropout_edge_rates():
    from vimoclip_tpu.ops.dropout import thin_dropout

    x = jnp.ones((32, 32), jnp.float32)
    key = jax.random.key(0)
    # rate=1.0 -> all zeros (flax semantics), never x256 amplification
    np.testing.assert_array_equal(
        np.asarray(thin_dropout(x, 1.0, key)), np.zeros((32, 32), np.float32)
    )
    # rate below the 1/512 quantum -> exact no-op
    np.testing.assert_array_equal(
        np.asarray(thin_dropout(x, 1e-4, key)), np.asarray(x)
    )
    with pytest.raises(ValueError, match="rate"):
        thin_dropout(x, 1.5, key)
    with pytest.raises(ValueError, match="rate"):
        thin_dropout(x, -0.1, key)

"""Dynamic-int8 matmul path (ops/quant.py).

Op-level exactness against an integer-emulation oracle, nn.Dense parameter
compatibility, and end-to-end embedding fidelity through the ViT encoder —
the error bounds here are what licenses the ``--quantize int8`` extraction
flag (an opt-in approximation; parity surfaces stay float)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vimoclip_tpu.ops.quant import (
    Int8Dense,
    int8_dynamic_matmul,
    make_dense,
    quantize_rowwise,
)


def test_quantize_rowwise_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(17, 64)).astype(np.float32)) * 3.0
    q, scale = quantize_rowwise(x)
    assert q.dtype == jnp.int8 and scale.shape == (17, 1)
    recon = q.astype(jnp.float32) * scale
    # symmetric round-to-nearest: elementwise error <= scale/2
    assert np.all(np.abs(np.asarray(recon - x)) <= np.asarray(scale) / 2 + 1e-7)
    # the absmax element hits +-127 exactly
    assert int(jnp.max(jnp.abs(q))) == 127


def test_quantize_rowwise_axis0_and_zero_rows():
    x = jnp.zeros((4, 8), jnp.float32)
    q, scale = quantize_rowwise(x, axis=0)
    assert scale.shape == (1, 8)
    assert np.all(np.asarray(q) == 0) and np.all(np.isfinite(np.asarray(scale)))


def test_int8_matmul_matches_integer_emulation():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(5, 7, 32)).astype(np.float32)
    w = rng.normal(size=(32, 24)).astype(np.float32)

    got = np.asarray(int8_dynamic_matmul(jnp.asarray(x), jnp.asarray(w)))

    xs = np.maximum(np.abs(x).max(-1, keepdims=True), 1e-12) / 127.0
    ws = np.maximum(np.abs(w).max(0, keepdims=True), 1e-12) / 127.0
    xq = np.clip(np.round(x / xs), -127, 127).astype(np.int32)
    wq = np.clip(np.round(w / ws), -127, 127).astype(np.int32)
    want = (xq.reshape(-1, 32) @ wq).reshape(5, 7, 24).astype(np.float32) * (xs * ws)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_int8_matmul_bf16_in_out():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    y = int8_dynamic_matmul(x, w)
    assert y.dtype == jnp.bfloat16 and y.shape == (4, 8)
    ref = x.astype(jnp.float32) @ w
    # rounding error only — int8 quant keeps ~1% relative accuracy here
    rel = np.linalg.norm(np.asarray(y, np.float32) - np.asarray(ref)) / (
        np.linalg.norm(np.asarray(ref))
    )
    assert rel < 0.05, rel


def test_int8_matmul_shape_mismatch():
    with pytest.raises(ValueError, match="shape mismatch"):
        int8_dynamic_matmul(jnp.zeros((2, 3)), jnp.zeros((4, 5)))


def test_make_dense_switch():
    assert make_dense(None) is nn.Dense
    assert make_dense("none") is nn.Dense
    assert make_dense("int8") is Int8Dense
    with pytest.raises(ValueError, match="matmul_quant"):
        make_dense("fp4")


def test_int8_dense_is_dense_param_compatible():
    """nn.Dense params load into Int8Dense unchanged (same tree + shapes)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(6, 20)).astype(np.float32))
    ref = nn.Dense(12)
    ref_params = ref.init(jax.random.key(0), x)["params"]
    qd = Int8Dense(12)
    q_params = qd.init(jax.random.key(0), x)["params"]
    assert jax.tree.structure(ref_params) == jax.tree.structure(q_params)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(q_params))
    )
    y_ref = ref.apply({"params": ref_params}, x)
    y_q = qd.apply({"params": ref_params}, x)
    rel = np.linalg.norm(np.asarray(y_q - y_ref)) / np.linalg.norm(np.asarray(y_ref))
    assert rel < 0.03, rel


def test_vit_encoder_int8_embedding_fidelity():
    """Same params, quantized vs float forward: near-identical embeddings.

    Pinned on a small random-init encoder (no pretrained weights on this
    rig, CLAUDE.md); the bound is the advertised contract of
    ``--quantize int8``."""
    import dataclasses

    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder

    cfg = ClipVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, num_layers=4,
        num_heads=4, intermediate_size=128, projection_dim=32,
    )
    rng = np.random.default_rng(4)
    pixels = jnp.asarray(rng.normal(size=(3, 32, 32, 3)).astype(np.float32))
    enc = ClipVisionEncoder(cfg)
    params = enc.init(jax.random.key(1), pixels)["params"]

    ref = enc.apply({"params": params}, pixels)
    qcfg = dataclasses.replace(cfg, matmul_quant="int8")
    got = ClipVisionEncoder(qcfg).apply({"params": params}, pixels)

    assert got.shape == ref.shape
    r = np.asarray(ref, np.float64)
    g = np.asarray(got, np.float64)
    cos = (r * g).sum(-1) / (np.linalg.norm(r, axis=-1) * np.linalg.norm(g, axis=-1))
    assert np.all(cos > 0.995), cos
    rel = np.linalg.norm(g - r) / np.linalg.norm(r)
    assert rel < 0.05, rel


def test_extraction_cli_quantize_end_to_end(tmp_path):
    """`vimo-extract-embeddings --quantize int8` produces embeddings close
    to the float run on the same corpus (flag -> config -> encoder)."""
    import os

    import h5py
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    from vimoclip_tpu.cli.extract_embeddings import main
    from vimoclip_tpu.data.video_reader import write_video

    rng = np.random.default_rng(5)
    root = str(tmp_path / "videos")
    os.makedirs(root)
    for i in range(2):
        write_video(
            os.path.join(root, f"v{i}.mp4"),
            rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8),
        )
    ann = str(tmp_path / "train.txt")
    with open(ann, "w") as f:
        f.write("v0.mp4 0\nv1.mp4 1\n")
    cls = str(tmp_path / "classes.csv")
    with open(cls, "w") as f:
        f.write("id,name\n0,run\n1,walk\n")

    torch.manual_seed(2)
    hf = CLIPVisionModelWithProjection(HFConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8, projection_dim=16))
    ckpt = str(tmp_path / "clip.pt")
    torch.save(hf.state_dict(), ckpt)

    outs = {}
    for tag, extra in (("f32", []), ("int8", ["--quantize", "int8"])):
        out = str(tmp_path / f"{tag}.h5")
        main([
            "--data-root", root, "--annotation-file", ann,
            "--class-file", cls, "--output", out, "--clip-weights", ckpt,
            "--batch-size", "8", "--split", "train", "--float32", *extra,
        ])
        with h5py.File(out, "r") as f:
            outs[tag] = np.asarray(f["v0.mp4"]["embeddings"][:], np.float64)

    a, b = outs["f32"], outs["int8"]
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )
    assert np.all(cos > 0.99), cos
    assert not np.allclose(a, b)  # it really took the quantized path


@pytest.mark.parametrize("variant", ["fused", "fused_qkv"])
def test_int8_composes_with_fused_head_proj(variant):
    """head_proj="fused"/"fused_qkv" with matmul_quant="int8" is the SAME
    approximation as the split int8 path — identical dynamic scales
    (per-token rows, per-output-channel columns), exact int32 accumulation,
    so outputs match bit for bit (ops/attention._FusedHeadProj/_FusedOutProj
    int8 branches). Params stay nn.Dense-layout-identical."""
    import dataclasses

    from vimoclip_tpu.ops.attention import MultiHeadAttention

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 9, 64)).astype(np.float32))

    split = MultiHeadAttention(embed_dim=64, num_heads=4, quant="int8")
    fused = MultiHeadAttention(
        embed_dim=64, num_heads=4, quant="int8", head_proj=variant
    )
    params = split.init(jax.random.key(0), x)
    fparams = fused.init(jax.random.key(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(fparams)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(fparams)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(fused.apply(params, x)),
        np.asarray(split.apply(params, x)),
    )
    # and it really is the quantized path, not a silent float fallback
    noq = MultiHeadAttention(embed_dim=64, num_heads=4, head_proj=variant)
    assert not np.allclose(
        np.asarray(noq.apply(params, x)), np.asarray(fused.apply(params, x))
    )

"""Golden tests: ClipVisionEncoder vs HF transformers CLIP (random-init from
config — no network/weights needed), and the OpenAI-format converter vs the
HF-format converter on re-packed identical weights."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder, quick_gelu
from vimoclip_tpu.models.clip_convert import (
    clip_vision_params_from_hf,
    clip_vision_params_from_openai,
    config_from_hf_state,
)


@pytest.fixture(scope="module")
def hf_model_and_state():
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    torch.manual_seed(7)
    hf_cfg = HFConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=8, projection_dim=48,
    )
    model = CLIPVisionModelWithProjection(hf_cfg).eval()
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    return model, state


CFG = ClipVisionConfig(
    image_size=32, patch_size=8, hidden_size=64, num_layers=3,
    num_heads=4, intermediate_size=128, projection_dim=48,
)


def test_quick_gelu_matches_torch():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    ours = np.asarray(quick_gelu(jnp.asarray(x)))
    ref = (torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_clip_vision_matches_hf(hf_model_and_state):
    model, state = hf_model_and_state
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(4, 3, 32, 32)).astype(np.float32)  # NCHW for torch

    with torch.no_grad():
        ref = model(torch.from_numpy(pixels)).image_embeds.numpy()

    params = clip_vision_params_from_hf(state, CFG)
    enc = ClipVisionEncoder(CFG)
    nhwc = jnp.asarray(pixels.transpose(0, 2, 3, 1))
    got = np.asarray(enc.apply({"params": params}, nhwc))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_openai_converter_equals_hf_converter(hf_model_and_state):
    """Repack the HF weights into the OpenAI clip serialization and check both
    converters produce identical Flax params."""
    _, s = hf_model_and_state
    oai = {
        "visual.class_embedding": s["vision_model.embeddings.class_embedding"],
        "visual.positional_embedding": s["vision_model.embeddings.position_embedding.weight"],
        "visual.conv1.weight": s["vision_model.embeddings.patch_embedding.weight"],
        "visual.ln_pre.weight": s["vision_model.pre_layrnorm.weight"],
        "visual.ln_pre.bias": s["vision_model.pre_layrnorm.bias"],
        "visual.ln_post.weight": s["vision_model.post_layernorm.weight"],
        "visual.ln_post.bias": s["vision_model.post_layernorm.bias"],
        "visual.proj": s["visual_projection.weight"].T,
    }
    for i in range(CFG.num_layers):
        t = f"vision_model.encoder.layers.{i}"
        o = f"visual.transformer.resblocks.{i}"
        oai[f"{o}.attn.in_proj_weight"] = np.concatenate(
            [s[f"{t}.self_attn.{p}_proj.weight"] for p in "qkv"], axis=0
        )
        oai[f"{o}.attn.in_proj_bias"] = np.concatenate(
            [s[f"{t}.self_attn.{p}_proj.bias"] for p in "qkv"], axis=0
        )
        oai[f"{o}.attn.out_proj.weight"] = s[f"{t}.self_attn.out_proj.weight"]
        oai[f"{o}.attn.out_proj.bias"] = s[f"{t}.self_attn.out_proj.bias"]
        oai[f"{o}.ln_1.weight"] = s[f"{t}.layer_norm1.weight"]
        oai[f"{o}.ln_1.bias"] = s[f"{t}.layer_norm1.bias"]
        oai[f"{o}.ln_2.weight"] = s[f"{t}.layer_norm2.weight"]
        oai[f"{o}.ln_2.bias"] = s[f"{t}.layer_norm2.bias"]
        oai[f"{o}.mlp.c_fc.weight"] = s[f"{t}.mlp.fc1.weight"]
        oai[f"{o}.mlp.c_fc.bias"] = s[f"{t}.mlp.fc1.bias"]
        oai[f"{o}.mlp.c_proj.weight"] = s[f"{t}.mlp.fc2.weight"]
        oai[f"{o}.mlp.c_proj.bias"] = s[f"{t}.mlp.fc2.bias"]

    p_hf = clip_vision_params_from_hf(s, CFG)
    p_oai = clip_vision_params_from_openai(oai, CFG)

    import jax

    flat_hf = jax.tree_util.tree_flatten_with_path(p_hf)[0]
    flat_oai = dict(jax.tree_util.tree_flatten_with_path(p_oai)[0])
    assert len(flat_hf) == len(flat_oai)
    for path, leaf in flat_hf:
        np.testing.assert_array_equal(leaf, flat_oai[path], err_msg=str(path))


def test_config_inference_from_state(hf_model_and_state):
    _, state = hf_model_and_state
    cfg = config_from_hf_state(state)
    assert (cfg.image_size, cfg.patch_size, cfg.hidden_size) == (32, 8, 64)
    assert (cfg.num_layers, cfg.intermediate_size, cfg.projection_dim) == (3, 128, 48)


def test_vit_l14_proportioned_loading(tmp_path):
    """The loader handles non-B geometries end to end: a ViT-L/14-shaped
    checkpoint (patch 14, d_head=64 head inference via hidden//64, 4x FFN)
    saved as a torch file round-trips through models.pretrained
    .load_clip_vision with torch-parity embeddings — the geometry a user
    upgrading the teacher to ViT-L/14 exercises."""
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    from vimoclip_tpu.models.pretrained import load_clip_vision

    torch.manual_seed(11)
    # L/14 proportions scaled down: hidden/heads ratio 64 (L: 1024/16),
    # FFN 4x hidden (L: 4096), patch 14, square grid
    hf_cfg = HFConfig(
        hidden_size=128, intermediate_size=512, num_hidden_layers=4,
        num_attention_heads=2, image_size=28, patch_size=14,
        projection_dim=96,
    )
    model = CLIPVisionModelWithProjection(hf_cfg).eval()
    ckpt = str(tmp_path / "vit_l14_like.pt")
    torch.save(model.state_dict(), ckpt)

    cfg, params = load_clip_vision(ckpt)
    assert (cfg.patch_size, cfg.hidden_size, cfg.num_heads) == (14, 128, 2)
    assert (cfg.num_layers, cfg.intermediate_size) == (4, 512)
    assert (cfg.image_size, cfg.projection_dim) == (28, 96)

    rng = np.random.default_rng(3)
    pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(pixels)).image_embeds.numpy()
    got = np.asarray(
        ClipVisionEncoder(cfg).apply(
            {"params": params}, jnp.asarray(pixels.transpose(0, 2, 3, 1))
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_bf16_close_to_f32(hf_model_and_state):
    _, state = hf_model_and_state
    params = clip_vision_params_from_hf(state, CFG)
    rng = np.random.default_rng(1)
    nhwc = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    f32 = np.asarray(ClipVisionEncoder(CFG).apply({"params": params}, nhwc))
    bf16 = np.asarray(
        ClipVisionEncoder(CFG, dtype=jnp.bfloat16).apply({"params": params}, nhwc)
    ).astype(np.float32)
    # bf16 matmuls, f32 params: cosine similarity should stay ~1
    cos = (f32 * bf16).sum(-1) / (
        np.linalg.norm(f32, axis=-1) * np.linalg.norm(bf16, axis=-1)
    )
    assert cos.min() > 0.995


@pytest.mark.parametrize("variant", ["fused", "fused_qkv"])
def test_head_proj_fused_matches_split_vit(variant):
    """ClipVisionConfig.head_proj is a scheduling switch only — identical
    param tree and outputs vs the split path (docs/PERF.md ledger 17)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder

    cfg = ClipVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, num_layers=2,
        num_heads=4, intermediate_size=128, projection_dim=32,
    )
    pixels = jnp.asarray(
        np.random.default_rng(3).normal(size=(2, 32, 32, 3)).astype(np.float32)
    )
    split = ClipVisionEncoder(cfg)
    fused = ClipVisionEncoder(dataclasses.replace(cfg, head_proj=variant))
    params = split.init(jax.random.key(0), pixels)
    fparams = fused.init(jax.random.key(0), pixels)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(fparams)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(
        np.asarray(fused.apply(params, pixels)),
        np.asarray(split.apply(params, pixels)),
        atol=2e-5,
    )

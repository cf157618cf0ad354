"""Numerical-parity tests: vimoclip_tpu TFAM vs a torch transcription of the
reference fusion transformer (reference TFAM/models/AMO_CLIP.py). Weights are
generated in torch, converted via models.torch_compat, and logits compared in
eval mode across all fusion modes."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from vimoclip_tpu.config import TFAMModelConfig
from vimoclip_tpu.models import TFAM
from vimoclip_tpu.models.torch_compat import tfam_params_from_torch

D, HEADS, LAYERS, FF, CLASSES = 64, 4, 2, 128, 9


class TorchBlock(nn.Module):
    """Torch oracle for the reference AttentionLayer (post-norm, optional
    cross-attention, ReLU FFN) built from torch primitives."""

    def __init__(self):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(D, HEADS, dropout=0.0, batch_first=True)
        self.cross_attn = nn.MultiheadAttention(D, HEADS, dropout=0.0, batch_first=True)
        self.ffn = nn.Sequential(
            nn.Linear(D, FF), nn.ReLU(), nn.Dropout(0.0), nn.Linear(FF, D), nn.Dropout(0.0)
        )
        self.norm_self = nn.LayerNorm(D)
        self.norm_cross = nn.LayerNorm(D)
        self.norm_ffn = nn.LayerNorm(D)

    def forward(self, x, cross_src=None, src_kpm=None, cross_kpm=None):
        a, _ = self.self_attn(x, x, x, key_padding_mask=src_kpm)
        x = self.norm_self(x + a)
        if cross_src is not None:
            a, _ = self.cross_attn(x, cross_src, cross_src, key_padding_mask=cross_kpm)
            x = self.norm_cross(x + a)
        x = self.norm_ffn(x + self.ffn(x))
        return x


class TorchOracle(nn.Module):
    def __init__(self, mode, concat_dim=1, use_pe=False):
        super().__init__()
        self.mode, self.concat_dim, self.use_pe = mode, concat_dim, use_pe
        self.layers = nn.ModuleList([TorchBlock() for _ in range(LAYERS)])
        self.classifier = nn.Sequential(
            nn.LayerNorm(D), nn.Linear(D, D // 2), nn.GELU(), nn.Dropout(0.0),
            nn.Linear(D // 2, CLASSES),
        )
        self.projection_layer = nn.Linear(2 * D, D)

    def _pe(self, seq_len):
        position = torch.arange(seq_len).unsqueeze(1)
        div = torch.exp(torch.arange(0, D, 2) * (-math.log(10000.0) / D))
        pe = torch.zeros(seq_len, D)
        pe[:, 0::2] = torch.sin(position * div)
        pe[:, 1::2] = torch.cos(position * div)
        return pe

    def forward(self, rgb, motion, mask_rgb, mask_flow):
        kpm_rgb, kpm_flow = ~mask_rgb, ~mask_flow
        if self.use_pe:
            rgb = rgb + self._pe(rgb.size(1)).unsqueeze(0)
            motion = motion + self._pe(motion.size(1)).unsqueeze(0)
        if self.mode == "rgb":
            x = rgb
            for l in self.layers:
                x = l(x, src_kpm=kpm_rgb)
        elif self.mode == "flow":
            x = motion
            for l in self.layers:
                x = l(x, src_kpm=kpm_flow)
        elif self.mode == "cross":
            x = rgb
            for l in self.layers:
                x = l(x, cross_src=motion, src_kpm=kpm_rgb, cross_kpm=kpm_flow)
        else:  # concat
            rgb, kpm_rgb = rgb[:, :-1, :], kpm_rgb[:, :-1]
            if self.concat_dim == 1:
                x = torch.cat([rgb, motion], dim=1)
                kpm = torch.cat([kpm_rgb, kpm_flow], dim=1)
            else:
                x = self.projection_layer(torch.cat([rgb, motion], dim=-1))
                kpm = kpm_flow
            for l in self.layers:
                x = l(x, src_kpm=kpm)
        return self.classifier(x.mean(dim=1))


def _inputs(seed=0, b=3, t=11):
    rng = np.random.default_rng(seed)
    rgb = rng.normal(size=(b, t, D)).astype(np.float32)
    motion = rng.normal(size=(b, t - 1, D)).astype(np.float32)
    lens = np.array([t, t - 3, t - 5])
    mask_rgb = np.arange(t)[None, :] < lens[:, None]
    mask_flow = np.arange(t - 1)[None, :] < (lens - 1)[:, None]
    return rgb, motion, mask_rgb, mask_flow


def _config(mode, concat_dim=1, use_pe=False, masked_pooling=False):
    return TFAMModelConfig(
        d_model=D, nhead=HEADS, num_layers=LAYERS, dim_feedforward=FF,
        use_cross_attention=(mode == "cross"),
        use_only_rgb=(mode == "rgb"), use_only_flow=(mode == "flow"),
        concat_dim=concat_dim, use_pe=use_pe, dropout=0.1, mlp_dropout=0.3,
        masked_pooling=masked_pooling,
    )


@pytest.mark.parametrize(
    "mode,concat_dim,use_pe",
    [
        ("cross", 1, False),
        ("cross", 1, True),
        ("rgb", 1, False),
        ("flow", 1, False),
        ("concat", 1, False),
        ("concat", -1, False),
    ],
)
def test_tfam_matches_torch_oracle(mode, concat_dim, use_pe):
    torch.manual_seed(5)
    oracle = TorchOracle(mode, concat_dim=concat_dim, use_pe=use_pe).eval()
    rgb, motion, mask_rgb, mask_flow = _inputs()

    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(rgb), torch.from_numpy(motion),
            torch.from_numpy(mask_rgb), torch.from_numpy(mask_flow),
        ).numpy()

    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params = tfam_params_from_torch(state, num_layers=LAYERS, d_model=D)

    model = TFAM(config=_config(mode, concat_dim, use_pe), num_classes=CLASSES)
    got = model.apply(
        {"params": params},
        jnp.asarray(rgb), jnp.asarray(motion),
        jnp.asarray(mask_rgb), jnp.asarray(mask_flow),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_tfam_mask_actually_masks():
    """Changing values at padded positions must not change the logits."""
    rgb, motion, mask_rgb, mask_flow = _inputs(seed=1)
    cfg = _config("cross", masked_pooling=True)
    model = TFAM(config=cfg, num_classes=CLASSES)
    params = model.init(
        jax.random.key(0), jnp.asarray(rgb), jnp.asarray(motion),
        jnp.asarray(mask_rgb), jnp.asarray(mask_flow),
    )["params"]

    out1 = model.apply({"params": params}, jnp.asarray(rgb), jnp.asarray(motion),
                       jnp.asarray(mask_rgb), jnp.asarray(mask_flow))
    rgb2 = rgb.copy()
    rgb2[~mask_rgb] = 99.0  # poison the pads
    motion2 = motion.copy()
    motion2[~mask_flow] = -77.0
    out2 = model.apply({"params": params}, jnp.asarray(rgb2), jnp.asarray(motion2),
                       jnp.asarray(mask_rgb), jnp.asarray(mask_flow))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_tfam_unmasked_pooling_sees_pads():
    """Reference-parity mode pools over pads (AMO_CLIP.py:170): poisoning a
    pad MUST change the output. Documents the preserved quirk."""
    rgb, motion, mask_rgb, mask_flow = _inputs(seed=2)
    cfg = _config("cross", masked_pooling=False)
    model = TFAM(config=cfg, num_classes=CLASSES)
    params = model.init(
        jax.random.key(0), jnp.asarray(rgb), jnp.asarray(motion),
        jnp.asarray(mask_rgb), jnp.asarray(mask_flow),
    )["params"]
    out1 = model.apply({"params": params}, jnp.asarray(rgb), jnp.asarray(motion),
                       jnp.asarray(mask_rgb), jnp.asarray(mask_flow))
    rgb2 = rgb.copy()
    rgb2[~mask_rgb] = 99.0
    out2 = model.apply({"params": params}, jnp.asarray(rgb2), jnp.asarray(motion),
                       jnp.asarray(mask_rgb), jnp.asarray(mask_flow))
    assert not np.allclose(np.asarray(out1), np.asarray(out2), atol=1e-3)


def test_tfam_dropout_active_in_training_mode():
    rgb, motion, mask_rgb, mask_flow = _inputs(seed=3)
    cfg = _config("cross")
    model = TFAM(config=cfg, num_classes=CLASSES)
    args = (jnp.asarray(rgb), jnp.asarray(motion), jnp.asarray(mask_rgb),
            jnp.asarray(mask_flow))
    params = model.init(jax.random.key(0), *args)["params"]
    out_det = model.apply({"params": params}, *args, deterministic=True)
    out_a = model.apply({"params": params}, *args, deterministic=False,
                        rngs={"dropout": jax.random.key(1)})
    out_b = model.apply({"params": params}, *args, deterministic=False,
                        rngs={"dropout": jax.random.key(2)})
    assert not np.allclose(np.asarray(out_a), np.asarray(out_det))
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_tfam_flash_attention_matches_xla():
    """attention_impl='flash' (Pallas, interpreter on CPU) must reproduce the
    XLA path's logits in eval mode."""
    rgb, motion, mask_rgb, mask_flow = _inputs(seed=9)
    args = (jnp.asarray(rgb), jnp.asarray(motion), jnp.asarray(mask_rgb),
            jnp.asarray(mask_flow))
    model_xla = TFAM(config=_config("cross"), num_classes=CLASSES)
    params = model_xla.init(jax.random.key(0), *args)["params"]
    out_xla = model_xla.apply({"params": params}, *args, deterministic=True)

    import dataclasses
    cfg_flash = dataclasses.replace(_config("cross"), attention_impl="flash")
    model_flash = TFAM(config=cfg_flash, num_classes=CLASSES)
    out_flash = model_flash.apply({"params": params}, *args, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_xla), rtol=1e-4, atol=1e-5
    )


def test_tfam_bf16_close_to_f32():
    rgb, motion, mask_rgb, mask_flow = _inputs(seed=12)
    args = (jnp.asarray(rgb), jnp.asarray(motion), jnp.asarray(mask_rgb),
            jnp.asarray(mask_flow))
    cfg = _config("cross")
    model32 = TFAM(config=cfg, num_classes=CLASSES)
    params = model32.init(jax.random.key(0), *args)["params"]
    out32 = np.asarray(model32.apply({"params": params}, *args, deterministic=True))
    model16 = TFAM(config=cfg, num_classes=CLASSES, dtype=jnp.bfloat16)
    out16 = np.asarray(
        model16.apply({"params": params}, *args, deterministic=True)
    ).astype(np.float32)
    assert np.abs(out32 - out16).max() < 0.15  # bf16 matmul rounding
    assert np.corrcoef(out32.ravel(), out16.ravel())[0, 1] > 0.999


@pytest.mark.parametrize("mode,concat_dim", [("cross", 1), ("rgb", 1),
                                             ("concat", 1), ("concat", -1)])
def test_tfam_bucket_padding_invariance(mode, concat_dim):
    """XLA shape-bucket padding beyond the batch max must not change logits:
    the reference pools (unmasked) over the batch-max padded layout, and our
    pooling reproduces exactly that regardless of extra bucket pads."""
    rgb, motion, mask_rgb, mask_flow = _inputs(seed=21)  # batchmax t=11/10
    cfg = _config(mode, concat_dim)
    model = TFAM(config=cfg, num_classes=CLASSES)
    args_ref = (jnp.asarray(rgb), jnp.asarray(motion),
                jnp.asarray(mask_rgb), jnp.asarray(mask_flow))
    params = model.init(jax.random.key(3), *args_ref)["params"]
    out_ref = model.apply({"params": params}, *args_ref, deterministic=True)

    # bucket-pad both streams with zeros up to 16 (past the batch max)
    def pad_to(a, t):
        return np.concatenate(
            [a, np.zeros((a.shape[0], t - a.shape[1]) + a.shape[2:], a.dtype)],
            axis=1,
        )

    args_bucket = (
        jnp.asarray(pad_to(rgb, 16)), jnp.asarray(pad_to(motion, 16)),
        jnp.asarray(pad_to(mask_rgb, 16)), jnp.asarray(pad_to(mask_flow, 16)),
    )
    out_bucket = model.apply({"params": params}, *args_bucket, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_bucket), np.asarray(out_ref), rtol=1e-4, atol=1e-5
    )


def test_torch_roundtrip_conversion():
    """flax -> torch state dict -> flax must be the identity (enables
    exporting TPU-trained TFAM models back to the reference format)."""
    from vimoclip_tpu.models.torch_compat import (
        tfam_params_from_torch,
        tfam_params_to_torch,
    )

    rgb, motion, mask_rgb, mask_flow = _inputs(seed=31)
    model = TFAM(config=_config("cross"), num_classes=CLASSES)
    params = model.init(
        jax.random.key(7), jnp.asarray(rgb), jnp.asarray(motion),
        jnp.asarray(mask_rgb), jnp.asarray(mask_flow),
    )["params"]
    state = tfam_params_to_torch(params, num_layers=LAYERS)
    back = tfam_params_from_torch(state, num_layers=LAYERS, d_model=D)

    flat_a = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
    # classifier_* / projection keys exist in params but not cross-layer —
    # compare the intersection, which must cover everything in `back`
    assert set(flat_b).issubset(set(flat_a))
    for path, leaf in flat_b.items():
        np.testing.assert_array_equal(np.asarray(flat_a[path]), np.asarray(leaf))


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_tfam_bucket_invariance_random_lengths(seed):
    """Property test: for random per-video lengths, bucket-padded logits must
    equal the reference batch-max layout in cross-attention mode."""
    rng = np.random.default_rng(seed)
    b = 4
    lens = rng.integers(2, 12, size=b)
    t = int(lens.max())
    rgb = rng.normal(size=(b, t, D)).astype(np.float32)
    motion = rng.normal(size=(b, t - 1, D)).astype(np.float32)
    mask_rgb = np.arange(t)[None, :] < lens[:, None]
    mask_flow = np.arange(t - 1)[None, :] < (lens - 1)[:, None]
    rgb[~mask_rgb] = 0
    motion[~mask_flow] = 0

    model = TFAM(config=_config("cross"), num_classes=CLASSES)
    args = (jnp.asarray(rgb), jnp.asarray(motion), jnp.asarray(mask_rgb),
            jnp.asarray(mask_flow))
    params = model.init(jax.random.key(seed), *args)["params"]
    ref = model.apply({"params": params}, *args, deterministic=True)

    pad = int(rng.integers(1, 9))
    def padded(a, extra):
        return np.concatenate(
            [a, np.zeros((b, extra) + a.shape[2:], a.dtype)], axis=1)
    got = model.apply(
        {"params": params},
        jnp.asarray(padded(rgb, pad)), jnp.asarray(padded(motion, pad + 1)),
        jnp.asarray(padded(mask_rgb, pad)), jnp.asarray(padded(mask_flow, pad + 1)),
        deterministic=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


import pytest as _pytest


@_pytest.mark.parametrize("variant", ["fused", "fused_qkv"])
def test_head_proj_fused_matches_split(variant):
    """head_proj="fused"/"fused_qkv" (ops/attention._FusedHeadProj/
    _FusedOutProj) is a SCHEDULING change only: identical param tree, same
    math — outputs match the reference-structure split path (docs/PERF.md
    data-formatting experiment)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vimoclip_tpu.config import TFAMModelConfig
    from vimoclip_tpu.models.tfam import TFAM

    cfg = TFAMModelConfig(
        d_model=32, nhead=4, num_layers=2, dim_feedforward=64,
        dropout=0.0, mlp_dropout=0.0, attention_impl="xla",
    )
    rng = np.random.default_rng(7)
    rgb = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    mot = jnp.asarray(rng.normal(size=(2, 8, 32)).astype(np.float32))
    mr = jnp.arange(9)[None, :] < jnp.array([9, 5])[:, None]
    mf = jnp.arange(8)[None, :] < jnp.array([8, 4])[:, None]

    split = TFAM(cfg, num_classes=5)
    fused = TFAM(dataclasses.replace(cfg, head_proj=variant), num_classes=5)
    params = split.init(jax.random.key(0), rgb, mot, mr, mf)
    fparams = fused.init(jax.random.key(0), rgb, mot, mr, mf)
    # identical param trees (shapes AND values: same init fns, same rngs)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(fparams)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out_s = split.apply(params, rgb, mot, mr, mf)
    out_f = fused.apply(params, rgb, mot, mr, mf)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_s), atol=1e-5
    )

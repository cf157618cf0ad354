"""Weight converters: HF / OpenAI CLIP checkpoints -> ClipVisionEncoder params.

Two serialization formats exist for the same weights (SURVEY.md §2.2 — the
reference loads HF ``CLIPModel`` for teachers and OpenAI ``clip.load`` for
the student backbone):

1. **HF transformers** (``CLIPModel`` / ``CLIPVisionModelWithProjection``):
   ``vision_model.embeddings.*``, ``vision_model.encoder.layers.{i}.*`` with
   separate q/k/v projections, typo'd ``pre_layrnorm``, and a
   ``visual_projection.weight`` Linear.
2. **OpenAI clip** (``model.visual.*`` inside the jit archive): packed
   ``attn.in_proj_weight``, ``mlp.c_fc``/``c_proj``, and a raw ``proj``
   matrix applied as ``x @ proj`` (no transpose).

Both converters are torch-free: input is ``{key: np.ndarray}``.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

from vimoclip_tpu.models.clip_vit import ClipVisionConfig
from vimoclip_tpu.models.torch_compat import (
    _layernorm as _ln,
    _linear as _lin,
)


def _t(w):  # torch Linear weight (out, in) -> flax kernel (in, out)
    return np.ascontiguousarray(np.asarray(w).T)


def clip_vision_params_from_hf(
    state: Mapping[str, np.ndarray], config: ClipVisionConfig
) -> dict:
    """Convert an HF CLIP(Vision)Model state dict (numpy values)."""
    s = dict(state)
    # Accept both CLIPModel ("vision_model. ...") and bare vision-model dumps.
    if not any(k.startswith("vision_model.") for k in s):
        s = {f"vision_model.{k}": v for k, v in s.items() if not k.startswith("visual_projection")} | {
            k: v for k, v in s.items() if k.startswith("visual_projection")
        }

    emb = "vision_model.embeddings"
    params: dict = {
        "class_embedding": np.asarray(s[f"{emb}.class_embedding"]),
        "position_embedding": np.asarray(s[f"{emb}.position_embedding.weight"]),
        # torch conv weight (E, 3, p, p) -> flax NHWC kernel (p, p, 3, E)
        "patch_embedding": {
            "kernel": np.ascontiguousarray(
                np.transpose(np.asarray(s[f"{emb}.patch_embedding.weight"]), (2, 3, 1, 0))
            )
        },
        # HF ships the typo'd name "pre_layrnorm"
        "pre_layernorm": _ln(s, "vision_model.pre_layrnorm"),
        "post_layernorm": _ln(s, "vision_model.post_layernorm"),
        "visual_projection": {"kernel": _t(s["visual_projection.weight"])},
    }
    for i in range(config.num_layers):
        t = f"vision_model.encoder.layers.{i}"
        params[f"layers_{i}"] = {
            "layer_norm1": _ln(s, f"{t}.layer_norm1"),
            "layer_norm2": _ln(s, f"{t}.layer_norm2"),
            "attn": {
                "q_proj": _lin(s, f"{t}.self_attn.q_proj"),
                "k_proj": _lin(s, f"{t}.self_attn.k_proj"),
                "v_proj": _lin(s, f"{t}.self_attn.v_proj"),
                "out_proj": _lin(s, f"{t}.self_attn.out_proj"),
            },
            "mlp_fc1": _lin(s, f"{t}.mlp.fc1"),
            "mlp_fc2": _lin(s, f"{t}.mlp.fc2"),
        }
    return params


def clip_vision_params_from_openai(
    state: Mapping[str, np.ndarray], config: ClipVisionConfig
) -> dict:
    """Convert an OpenAI ``clip`` package state dict (``visual.*`` keys,
    numpy values) — the format of the reference student's backbone
    (models/student_model.py:44)."""
    s = {k[len("visual."):]: v for k, v in state.items() if k.startswith("visual.")}
    e = config.hidden_size
    params: dict = {
        "class_embedding": np.asarray(s["class_embedding"]),
        "position_embedding": np.asarray(s["positional_embedding"]),
        "patch_embedding": {
            "kernel": np.ascontiguousarray(
                np.transpose(np.asarray(s["conv1.weight"]), (2, 3, 1, 0))
            )
        },
        "pre_layernorm": {"scale": np.asarray(s["ln_pre.weight"]),
                          "bias": np.asarray(s["ln_pre.bias"])},
        "post_layernorm": {"scale": np.asarray(s["ln_post.weight"]),
                           "bias": np.asarray(s["ln_post.bias"])},
        # OpenAI applies x @ proj directly: already (E, projection_dim)
        "visual_projection": {"kernel": np.asarray(s["proj"])},
    }
    for i in range(config.num_layers):
        t = f"transformer.resblocks.{i}"
        w = np.asarray(s[f"{t}.attn.in_proj_weight"])  # (3E, E)
        b = np.asarray(s[f"{t}.attn.in_proj_bias"])
        params[f"layers_{i}"] = {
            "layer_norm1": {"scale": np.asarray(s[f"{t}.ln_1.weight"]),
                            "bias": np.asarray(s[f"{t}.ln_1.bias"])},
            "layer_norm2": {"scale": np.asarray(s[f"{t}.ln_2.weight"]),
                            "bias": np.asarray(s[f"{t}.ln_2.bias"])},
            "attn": {
                "q_proj": {"kernel": _t(w[:e]), "bias": b[:e]},
                "k_proj": {"kernel": _t(w[e:2*e]), "bias": b[e:2*e]},
                "v_proj": {"kernel": _t(w[2*e:]), "bias": b[2*e:]},
                "out_proj": {"kernel": _t(s[f"{t}.attn.out_proj.weight"]),
                             "bias": np.asarray(s[f"{t}.attn.out_proj.bias"])},
            },
            "mlp_fc1": {"kernel": _t(s[f"{t}.mlp.c_fc.weight"]),
                        "bias": np.asarray(s[f"{t}.mlp.c_fc.bias"])},
            "mlp_fc2": {"kernel": _t(s[f"{t}.mlp.c_proj.weight"]),
                        "bias": np.asarray(s[f"{t}.mlp.c_proj.bias"])},
        }
    return params


def clip_vision_params_to_openai(
    params: Mapping, config: ClipVisionConfig, prefix: str = "visual."
) -> dict:
    """Reverse of :func:`clip_vision_params_from_openai`: Flax
    ``ClipVisionEncoder`` params -> OpenAI ``clip`` package visual state
    dict (numpy values), so backbones trained or fine-tuned here can be
    loaded back into torch stacks built on ``clip.load`` — including the
    reference student (models/student_model.py:44). Exact inverse: the
    from/to pair round-trips bit-identically (tests/test_clip_vit.py)."""
    p = params
    out: dict[str, np.ndarray] = {}

    def put(key, value):
        out[prefix + key] = np.ascontiguousarray(np.asarray(value))

    put("class_embedding", p["class_embedding"])
    put("positional_embedding", p["position_embedding"])
    # flax conv kernel (kh, kw, C, E) -> torch conv weight (E, C, kh, kw)
    put("conv1.weight",
        np.transpose(np.asarray(p["patch_embedding"]["kernel"]), (3, 2, 0, 1)))
    put("ln_pre.weight", p["pre_layernorm"]["scale"])
    put("ln_pre.bias", p["pre_layernorm"]["bias"])
    put("ln_post.weight", p["post_layernorm"]["scale"])
    put("ln_post.bias", p["post_layernorm"]["bias"])
    # OpenAI applies x @ proj directly: kernel is stored torch-layout
    put("proj", p["visual_projection"]["kernel"])
    for i in range(config.num_layers):
        layer = p[f"layers_{i}"]
        t = f"transformer.resblocks.{i}"
        attn = layer["attn"]
        put(f"{t}.attn.in_proj_weight", np.concatenate(
            [np.asarray(attn[n]["kernel"]).T
             for n in ("q_proj", "k_proj", "v_proj")], axis=0))
        put(f"{t}.attn.in_proj_bias", np.concatenate(
            [np.asarray(attn[n]["bias"])
             for n in ("q_proj", "k_proj", "v_proj")]))
        put(f"{t}.attn.out_proj.weight",
            np.asarray(attn["out_proj"]["kernel"]).T)
        put(f"{t}.attn.out_proj.bias", attn["out_proj"]["bias"])
        put(f"{t}.ln_1.weight", layer["layer_norm1"]["scale"])
        put(f"{t}.ln_1.bias", layer["layer_norm1"]["bias"])
        put(f"{t}.ln_2.weight", layer["layer_norm2"]["scale"])
        put(f"{t}.ln_2.bias", layer["layer_norm2"]["bias"])
        put(f"{t}.mlp.c_fc.weight", np.asarray(layer["mlp_fc1"]["kernel"]).T)
        put(f"{t}.mlp.c_fc.bias", layer["mlp_fc1"]["bias"])
        put(f"{t}.mlp.c_proj.weight", np.asarray(layer["mlp_fc2"]["kernel"]).T)
        put(f"{t}.mlp.c_proj.bias", layer["mlp_fc2"]["bias"])
    return out


def config_from_openai_state(
    state: Mapping[str, np.ndarray], prefix: str = "visual."
) -> ClipVisionConfig:
    """Infer a ClipVisionConfig from an OpenAI ``clip`` visual state dict's
    shapes — the geometry-detection twin of :func:`config_from_hf_state`,
    so a reference student checkpoint of ANY CLIP size loads without the
    user restating its geometry. Same heads caveat: not recoverable from
    weights; heads = hidden // 64 holds for every released CLIP ViT."""
    s = {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    conv = np.asarray(s["conv1.weight"])
    hidden, _, patch, _ = conv.shape
    n_pos = np.asarray(s["positional_embedding"]).shape[0]
    image = int(round((n_pos - 1) ** 0.5)) * patch
    n_layers = 1 + max(
        int(k.split(".")[2]) for k in s
        if k.startswith("transformer.resblocks.")
    )
    inter = np.asarray(s["transformer.resblocks.0.mlp.c_fc.weight"]).shape[0]
    proj = np.asarray(s["proj"]).shape[1]
    return ClipVisionConfig(
        image_size=image, patch_size=patch, hidden_size=hidden,
        num_layers=n_layers, num_heads=max(1, hidden // 64),
        intermediate_size=inter, projection_dim=proj,
    )


def config_from_hf_state(state: Mapping[str, np.ndarray]) -> ClipVisionConfig:
    """Infer a ClipVisionConfig from an HF state dict's shapes."""
    s = dict(state)
    patch_w = np.asarray(s["vision_model.embeddings.patch_embedding.weight"])
    hidden, _, patch, _ = patch_w.shape
    n_pos = np.asarray(s["vision_model.embeddings.position_embedding.weight"]).shape[0]
    image = int(round((n_pos - 1) ** 0.5)) * patch
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in s if k.startswith("vision_model.encoder.layers.")
    )
    inter = np.asarray(s["vision_model.encoder.layers.0.mlp.fc1.weight"]).shape[0]
    proj = np.asarray(s["visual_projection.weight"]).shape[0]
    # The head count is not recoverable from weight shapes; heads =
    # hidden // 64 holds for every released CLIP ViT (12 @ 768 for ViT-B).
    # Clamp to >= 1 so tiny test checkpoints stay loadable.
    return ClipVisionConfig(
        image_size=image, patch_size=patch, hidden_size=hidden,
        num_layers=n_layers, num_heads=max(1, hidden // 64),
        intermediate_size=inter, projection_dim=proj,
    )

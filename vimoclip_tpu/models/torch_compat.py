"""Converters from reference PyTorch checkpoints to Flax parameter pytrees.

The reference saves plain ``state_dict`` checkpoints, DataParallel-prefixed
with ``module.`` (SURVEY.md §5; reference inference.py:80-86). These
converters are torch-free: they take ``{key: numpy array}`` dicts (obtained
via ``{k: v.numpy() for k, v in torch.load(...).items()}`` or any
deserializer) so the TPU framework never imports torch at runtime.

Key mappings (torch ``nn.Linear`` stores (out, in) weights; Flax Dense
kernels are (in, out), hence the transposes; ``nn.MultiheadAttention`` packs
q/k/v into ``in_proj_weight`` which is split in thirds):

TFAM (reference TFAM/models/AMO_CLIP.py state dict -> vimoclip_tpu.models.tfam.TFAM):
    layers.{i}.self_attn.in_proj_weight  -> layers_{i}/self_attn/{q,k,v}_proj/kernel
    layers.{i}.self_attn.out_proj.*      -> layers_{i}/self_attn/out_proj/*
    layers.{i}.ffn.0 / ffn.3             -> layers_{i}/ffn_dense1 / ffn_dense2
    layers.{i}.norm_{self,cross,ffn}     -> layers_{i}/norm_{self,cross,ffn}
    classifier.0 / 1 / 4                 -> classifier_norm / _dense1 / _dense2
    projection_layer                     -> projection_layer
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def strip_prefix(state: Mapping[str, np.ndarray], prefix: str = "module.") -> dict:
    """Remove DataParallel's ``module.`` prefix (reference checkpoints carry
    it; loaders re-wrap before load_state_dict, reference inference.py:80-86)."""
    return {
        (k[len(prefix):] if k.startswith(prefix) else k): v for k, v in state.items()
    }


def _linear(state, torch_name):
    return {
        "kernel": np.ascontiguousarray(state[f"{torch_name}.weight"].T),
        "bias": np.asarray(state[f"{torch_name}.bias"]),
    }


def _layernorm(state, torch_name):
    return {
        "scale": np.asarray(state[f"{torch_name}.weight"]),
        "bias": np.asarray(state[f"{torch_name}.bias"]),
    }


def _mha(state, torch_name, embed_dim):
    w = np.asarray(state[f"{torch_name}.in_proj_weight"])  # (3E, E)
    b = np.asarray(state[f"{torch_name}.in_proj_bias"])  # (3E,)
    qw, kw, vw = w[:embed_dim], w[embed_dim : 2 * embed_dim], w[2 * embed_dim :]
    qb, kb, vb = b[:embed_dim], b[embed_dim : 2 * embed_dim], b[2 * embed_dim :]
    return {
        "q_proj": {"kernel": np.ascontiguousarray(qw.T), "bias": qb},
        "k_proj": {"kernel": np.ascontiguousarray(kw.T), "bias": kb},
        "v_proj": {"kernel": np.ascontiguousarray(vw.T), "bias": vb},
        "out_proj": _linear(state, f"{torch_name}.out_proj"),
    }


def tfam_params_from_checkpoint(
    path: str, num_layers: int = 4, d_model: int = 512
) -> dict:
    """Load a reference-format TFAM checkpoint file (best_model.pth,
    TFAM/train_and_eval.py:133-149) into Flax params: torch.load ->
    state-dict unwrap -> prefix strip -> tfam_params_from_torch. Shared by
    TFAMTester.load_torch_checkpoint and the vimo-predict CLI (torch needed
    at call time — offline tool path, never the TPU hot loop)."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    state = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    state = strip_prefix({k: v.numpy() for k, v in state.items()})
    return tfam_params_from_torch(state, num_layers=num_layers, d_model=d_model)


def tfam_params_from_torch(
    state: Mapping[str, np.ndarray],
    num_layers: int = 4,
    d_model: int = 512,
) -> dict:
    """Convert a reference AMO_CLIP state dict into TFAM Flax params."""
    state = strip_prefix(dict(state))
    params: dict = {}
    for i in range(num_layers):
        t = f"layers.{i}"
        layer = {
            "self_attn": _mha(state, f"{t}.self_attn", d_model),
            "ffn_dense1": _linear(state, f"{t}.ffn.0"),
            "ffn_dense2": _linear(state, f"{t}.ffn.3"),
            "norm_self": _layernorm(state, f"{t}.norm_self"),
            "norm_ffn": _layernorm(state, f"{t}.norm_ffn"),
        }
        if f"{t}.cross_attn.in_proj_weight" in state:
            layer["cross_attn"] = _mha(state, f"{t}.cross_attn", d_model)
            layer["norm_cross"] = _layernorm(state, f"{t}.norm_cross")
        params[f"layers_{i}"] = layer

    params["classifier_norm"] = _layernorm(state, "classifier.0")
    params["classifier_dense1"] = _linear(state, "classifier.1")
    params["classifier_dense2"] = _linear(state, "classifier.4")
    if "projection_layer.weight" in state:
        params["projection_layer"] = _linear(state, "projection_layer")
    return params


def residual_mlp_params_from_torch(state: Mapping[str, np.ndarray], prefix: str = "residual_mlp") -> dict:
    """ResidualMLP (reference models/student_model.py:8-35): fc1, fc2."""
    state = strip_prefix(dict(state))
    return {
        "fc1": _linear(state, f"{prefix}.fc1"),
        "fc2": _linear(state, f"{prefix}.fc2"),
    }


def _emit_linear(out: dict, flax_p: Mapping, torch_name: str) -> None:
    out[f"{torch_name}.weight"] = np.ascontiguousarray(
        np.asarray(flax_p["kernel"]).T
    )
    out[f"{torch_name}.bias"] = np.asarray(flax_p["bias"])


def student_params_from_torch(state: Mapping[str, np.ndarray],
                              vision_config) -> dict:
    """Reference ``FlowStudentModel``/``FrameDiffStudentModel`` state dict
    (models/student_model.py:38-59: OpenAI CLIP ``visual_encoder`` +
    ``residual_mlp`` + 2-layer ``classification_head``) -> StudentModel
    Flax params — loads a reference-trained stage-1 checkpoint
    (train.py:174 ``student_best.pth``) into this framework's exporter/
    predictor stack."""
    from vimoclip_tpu.models.clip_convert import clip_vision_params_from_openai

    state = strip_prefix(dict(state))
    visual = {f"visual.{k[len('visual_encoder.'):]}": v
              for k, v in state.items() if k.startswith("visual_encoder.")}
    return {
        "visual_encoder": clip_vision_params_from_openai(visual, vision_config),
        "residual_mlp": residual_mlp_params_from_torch(state),
        "head_dense1": _linear(state, "classification_head.0"),
        "head_dense2": _linear(state, "classification_head.2"),
    }


def student_params_from_checkpoint(path: str, vision_config=None):
    """Load a reference stage-1 student checkpoint FILE (student_best.pth,
    train.py:174 — a bare state dict, possibly DataParallel-prefixed) into
    StudentModel Flax params (torch needed at call time — offline tool
    path, never the TPU hot loop). File-level twin of
    :func:`tfam_params_from_checkpoint`.

    Returns ``(vision_config, params)``. With ``vision_config=None`` the
    backbone geometry is INFERRED from the checkpoint's own shapes
    (clip_convert.config_from_openai_state) — a reference student of any
    CLIP size loads without the user restating it."""
    import torch

    from vimoclip_tpu.models.clip_convert import config_from_openai_state

    raw = torch.load(path, map_location="cpu", weights_only=False)
    state = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    np_state = strip_prefix({k: v.numpy() for k, v in state.items()})
    if vision_config is None:
        vision_config = config_from_openai_state(np_state,
                                                 prefix="visual_encoder.")
    return vision_config, student_params_from_torch(np_state, vision_config)


def student_params_to_torch(params: Mapping, vision_config) -> dict:
    """Reverse conversion: StudentModel Flax params -> the reference
    student's state-dict layout (numpy values), so stage-1 models trained
    here can be loaded by the reference export/inference code via
    ``model.load_state_dict({k: torch.from_numpy(v) ...})``. Inverse of
    :func:`student_params_from_torch` (round-trip tested)."""
    from vimoclip_tpu.models.clip_convert import clip_vision_params_to_openai

    out: dict[str, np.ndarray] = {}
    for k, v in clip_vision_params_to_openai(
        params["visual_encoder"], vision_config, prefix=""
    ).items():
        out[f"visual_encoder.{k}"] = v
    _emit_linear(out, params["residual_mlp"]["fc1"], "residual_mlp.fc1")
    _emit_linear(out, params["residual_mlp"]["fc2"], "residual_mlp.fc2")
    _emit_linear(out, params["head_dense1"], "classification_head.0")
    _emit_linear(out, params["head_dense2"], "classification_head.2")
    return out


def tfam_params_to_torch(params: Mapping, num_layers: int = 4,
                         fill_missing_reference_modules: bool = False) -> dict:
    """Reverse conversion: TFAM Flax params -> reference AMO_CLIP state-dict
    layout (numpy values), so models trained here can be loaded by the
    reference code (or any torch tooling) via
    ``model.load_state_dict({k: torch.from_numpy(v) ...})``.

    The reference constructs ``cross_attn``/``norm_cross`` (AMO_CLIP.py:20)
    and ``projection_layer`` (:86) UNCONDITIONALLY, while this framework
    creates them lazily per fusion mode — so a bare conversion of e.g. a
    cross-attention model is missing ``projection_layer.*`` and the
    reference's strict ``load_state_dict`` (train_and_eval.py:189) rejects
    it. ``fill_missing_reference_modules=True`` synthesizes the unused
    modules with torch-default-shaped placeholders (LayerNorm ones/zeros,
    zero linears) — they are dead weights in the exported mode's forward
    path, exactly like the reference's own untrained unused modules."""
    out: dict[str, np.ndarray] = {}

    def lin(flax_p, torch_name):
        out[f"{torch_name}.weight"] = np.ascontiguousarray(
            np.asarray(flax_p["kernel"]).T
        )
        out[f"{torch_name}.bias"] = np.asarray(flax_p["bias"])

    def ln(flax_p, torch_name):
        out[f"{torch_name}.weight"] = np.asarray(flax_p["scale"])
        out[f"{torch_name}.bias"] = np.asarray(flax_p["bias"])

    def mha(flax_p, torch_name):
        w = np.concatenate(
            [np.asarray(flax_p[p]["kernel"]).T for p in ("q_proj", "k_proj", "v_proj")],
            axis=0,
        )
        b = np.concatenate(
            [np.asarray(flax_p[p]["bias"]) for p in ("q_proj", "k_proj", "v_proj")]
        )
        out[f"{torch_name}.in_proj_weight"] = np.ascontiguousarray(w)
        out[f"{torch_name}.in_proj_bias"] = b
        lin(flax_p["out_proj"], f"{torch_name}.out_proj")

    for i in range(num_layers):
        layer = params[f"layers_{i}"]
        mha(layer["self_attn"], f"layers.{i}.self_attn")
        if "cross_attn" in layer:
            mha(layer["cross_attn"], f"layers.{i}.cross_attn")
            ln(layer["norm_cross"], f"layers.{i}.norm_cross")
        lin(layer["ffn_dense1"], f"layers.{i}.ffn.0")
        lin(layer["ffn_dense2"], f"layers.{i}.ffn.3")
        ln(layer["norm_self"], f"layers.{i}.norm_self")
        ln(layer["norm_ffn"], f"layers.{i}.norm_ffn")
    ln(params["classifier_norm"], "classifier.0")
    lin(params["classifier_dense1"], "classifier.1")
    lin(params["classifier_dense2"], "classifier.4")
    if "projection_layer" in params:
        lin(params["projection_layer"], "projection_layer")

    if fill_missing_reference_modules:
        d = int(np.asarray(params["classifier_norm"]["scale"]).shape[0])

        def fill(key, shape, ones=False):
            if key not in out:
                out[key] = (np.ones(shape, np.float32) if ones
                            else np.zeros(shape, np.float32))

        for i in range(num_layers):
            t = f"layers.{i}"
            fill(f"{t}.cross_attn.in_proj_weight", (3 * d, d))
            fill(f"{t}.cross_attn.in_proj_bias", (3 * d,))
            fill(f"{t}.cross_attn.out_proj.weight", (d, d))
            fill(f"{t}.cross_attn.out_proj.bias", (d,))
            fill(f"{t}.norm_cross.weight", (d,), ones=True)
            fill(f"{t}.norm_cross.bias", (d,))
        fill("projection_layer.weight", (d, 2 * d))
        fill("projection_layer.bias", (d,))
    return out

"""Loading pretrained CLIP weights into Flax params.

The reference pulls weights at runtime from the HF hub
(extract_embeddings.py:17) or the OpenAI CDN (student_model.py:44). In a
zero-egress production setting weights come from local files; this module
accepts any of:

- a safetensors file (HF ``model.safetensors``),
- a torch ``pytorch_model.bin`` / ``.pt`` / ``.pth`` state dict (requires
  torch importable — used offline, never on the TPU hot path),
- an HF model directory or hub name resolvable by ``transformers`` from the
  local cache,

and returns ``(ClipVisionConfig, flax params)`` for ClipVisionEncoder. The
OpenAI jit-archive format is handled via its state dict
(clip_convert.clip_vision_params_from_openai).
"""

from __future__ import annotations

import os

import numpy as np

from vimoclip_tpu.models.clip_convert import (
    clip_vision_params_from_hf,
    clip_vision_params_from_openai,
    config_from_hf_state,
)
from vimoclip_tpu.models.clip_vit import ClipVisionConfig


def _numpy_state(obj) -> dict[str, np.ndarray]:
    out = {}
    for k, v in obj.items():
        out[k] = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return out


def load_clip_vision(source: str) -> tuple[ClipVisionConfig, dict]:
    """Load CLIP visual-tower weights from ``source`` (file, dir, hub name)."""
    state: dict[str, np.ndarray] | None = None
    if os.path.isfile(source) and source.endswith(".safetensors"):
        from safetensors.numpy import load_file

        state = load_file(source)
    elif os.path.isfile(source):
        import torch

        raw = torch.load(source, map_location="cpu", weights_only=False)
        if hasattr(raw, "state_dict"):
            raw = raw.state_dict()
        state = _numpy_state(raw)
    else:
        from transformers import CLIPModel

        model = CLIPModel.from_pretrained(source)
        state = _numpy_state(model.state_dict())

    if any(k.startswith("visual.") for k in state):
        # OpenAI clip serialization; config must be inferred from shapes
        conv = state["visual.conv1.weight"]
        hidden, _, patch, _ = conv.shape
        n_pos = state["visual.positional_embedding"].shape[0]
        image = int(round((n_pos - 1) ** 0.5)) * patch
        n_layers = 1 + max(
            int(k.split(".")[3])
            for k in state
            if k.startswith("visual.transformer.resblocks.")
        )
        config = ClipVisionConfig(
            image_size=image, patch_size=patch, hidden_size=hidden,
            num_layers=n_layers, num_heads=hidden // 64,
            intermediate_size=state["visual.transformer.resblocks.0.mlp.c_fc.weight"].shape[0],
            projection_dim=state["visual.proj"].shape[1],
        )
        return config, clip_vision_params_from_openai(state, config)

    config = config_from_hf_state(state)
    return config, clip_vision_params_from_hf(state, config)

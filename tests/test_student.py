"""Parity test: StudentModel vs a torch oracle assembled from HF CLIP vision
+ the reference's ResidualMLP / head formulas (models/student_model.py)."""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from vimoclip_tpu.models.clip_vit import ClipVisionConfig
from vimoclip_tpu.models.clip_convert import clip_vision_params_from_hf
from vimoclip_tpu.models.student import ResidualMLP, StudentModel
from vimoclip_tpu.models.torch_compat import residual_mlp_params_from_torch

CFG = ClipVisionConfig(
    image_size=32, patch_size=8, hidden_size=64, num_layers=2,
    num_heads=4, intermediate_size=128, projection_dim=48,
)
CLASSES = 7


def _torch_oracle():
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    torch.manual_seed(11)
    hf = CLIPVisionModelWithProjection(
        HFConfig(hidden_size=64, intermediate_size=128, num_hidden_layers=2,
                 num_attention_heads=4, image_size=32, patch_size=8,
                 projection_dim=48)
    ).eval()

    class TorchResidualMLP(nn.Module):
        def __init__(self, dim, alpha=0.1):
            super().__init__()
            self.fc1 = nn.Linear(dim, dim)
            self.fc2 = nn.Linear(dim, dim)
            nn.init.zeros_(self.fc2.weight)
            nn.init.zeros_(self.fc2.bias)
            # make fc2 nonzero so the test exercises the full path
            with torch.no_grad():
                self.fc2.weight.add_(torch.randn_like(self.fc2.weight) * 0.05)
            self.alpha = alpha

        def forward(self, x):
            return x + self.alpha * self.fc2(torch.nn.functional.gelu(self.fc1(x)))

    rmlp = TorchResidualMLP(48).eval()
    head = nn.Sequential(nn.Linear(48, 24), nn.ReLU(), nn.Linear(24, CLASSES)).eval()
    return hf, rmlp, head


def test_student_matches_torch_oracle():
    hf, rmlp, head = _torch_oracle()
    b, t = 2, 3
    rng = np.random.default_rng(0)
    # already-preprocessed float pixels: isolates model math from resize
    pixels = rng.normal(size=(b, t, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        flat = torch.from_numpy(pixels.reshape(b * t, 32, 32, 3).transpose(0, 3, 1, 2))
        emb = hf(flat).image_embeds.view(b, t, -1)
        ref_emb = emb.numpy()
        ref_distill = rmlp(emb).numpy()
        ref_logits = head(emb.mean(dim=1)).numpy()

    params = {
        "visual_encoder": clip_vision_params_from_hf(
            {k: v.numpy() for k, v in hf.state_dict().items()}, CFG
        ),
        "residual_mlp": residual_mlp_params_from_torch(
            {f"residual_mlp.{k}": v.numpy() for k, v in rmlp.state_dict().items()}
        ),
        "head_dense1": {"kernel": head[0].weight.detach().numpy().T,
                        "bias": head[0].bias.detach().numpy()},
        "head_dense2": {"kernel": head[2].weight.detach().numpy().T,
                        "bias": head[2].bias.detach().numpy()},
    }

    model = StudentModel(vision_config=CFG, num_classes=CLASSES)
    emb, distill, logits = model.apply(
        {"params": params}, jnp.asarray(pixels), preprocessed=True
    )
    np.testing.assert_allclose(np.asarray(emb), ref_emb, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(distill), ref_distill, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-5)


def test_student_uint8_path_runs():
    model = StudentModel(vision_config=CFG, num_classes=CLASSES)
    vid = np.random.default_rng(1).integers(0, 256, (1, 4, 48, 64, 3), dtype=np.uint8)
    params = model.init(jax.random.key(0), jnp.asarray(vid))["params"]
    emb, distill, logits = model.apply({"params": params}, jnp.asarray(vid))
    assert emb.shape == (1, 4, 48)
    assert distill.shape == (1, 4, 48)
    assert logits.shape == (1, CLASSES)


def test_residual_mlp_zero_init_is_identity():
    """Fresh init: fc2 is zero, so the distillation branch starts as the
    identity (the FROSTER PEFT trick, student_model.py:24-26)."""
    m = ResidualMLP(16)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 5, 16)).astype(np.float32))
    params = m.init(jax.random.key(0), x)["params"]
    np.testing.assert_allclose(np.asarray(m.apply({"params": params}, x)),
                               np.asarray(x), atol=1e-7)

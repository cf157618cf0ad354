"""vimo-convert: exporting TPU-trained checkpoints back to the reference's
torch formats (no lock-in in either direction).

- flax -> OpenAI-clip visual state dict -> flax must round-trip exactly
  (the from_openai side is anchored to the HF-torch oracle in
  test_clip_vit.py, so the pair pins the export layout).
- stage-1 student: full round-trip through the reference
  FlowStudentModel state-dict layout (models/student_model.py:38-59).
- stage-2 TFAM: the CLI's .pth strict-loads into a torch model with the
  reference's UNCONDITIONAL module layout (AMO_CLIP.py:20,86 create
  cross_attn/projection_layer regardless of mode) and reproduces the
  flax forward — the exact contract of the reference eval's
  ``load_state_dict(checkpoint["state_dict"])`` (train_and_eval.py:189).
"""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
from vimoclip_tpu.models.clip_convert import (
    clip_vision_params_from_openai,
    clip_vision_params_to_openai,
)
from vimoclip_tpu.models.torch_compat import (
    student_params_from_torch,
    student_params_to_torch,
)

sys.path.insert(0, os.path.dirname(__file__))

VCFG = ClipVisionConfig(
    image_size=32, patch_size=8, hidden_size=32, num_layers=2,
    num_heads=2, intermediate_size=64, projection_dim=16,
)


def _leaves(tree):
    return {
        jax.tree_util.keystr(p): np.asarray(v)
        for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def _assert_trees_equal(a, b):
    fa, fb = _leaves(a), _leaves(b)
    assert set(fa) == set(fb), set(fa) ^ set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_clip_openai_roundtrip():
    enc = ClipVisionEncoder(VCFG)
    params = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    state = clip_vision_params_to_openai(params, VCFG)
    assert all(k.startswith("visual.") for k in state)
    back = clip_vision_params_from_openai(state, VCFG)
    _assert_trees_equal(params, back)


def test_student_torch_roundtrip():
    from vimoclip_tpu.models.student import StudentModel

    model = StudentModel(vision_config=VCFG, num_classes=5)
    params = model.init(
        jax.random.key(1), jnp.zeros((1, 3, 32, 32, 3), jnp.uint8)
    )["params"]
    state = student_params_to_torch(params, VCFG)
    # the reference student's exact top-level module names
    # (models/student_model.py:47-59)
    prefixes = {k.split(".")[0] for k in state}
    assert prefixes == {"visual_encoder", "residual_mlp",
                        "classification_head"}
    assert "classification_head.0.weight" in state
    assert "classification_head.2.weight" in state
    back = student_params_from_torch(state, VCFG)
    _assert_trees_equal(params, back)


def _save_orbax_checkpoint(ckpt_dir, params, extra):
    """Save through the real CheckpointManager (the layout vimo-convert
    reads)."""
    from vimoclip_tpu.train.state import CheckpointManager, TrainState, make_adam

    mgr = CheckpointManager(str(ckpt_dir))
    state = TrainState.create(params, make_adam(1e-3))
    mgr.save(state, "best", extra=extra)
    mgr.wait_until_finished()


@pytest.mark.parametrize("mode", ["cross", "rgb"])
def test_convert_cli_tfam_strict_loads_and_matches_flax(tmp_path, mode):
    """End-to-end: Orbax best -> vimo-convert -> torch.load -> STRICT
    load_state_dict into a reference-layout torch model -> forward parity
    with the flax model. Covers the fill of the reference's unconditional
    modules (projection_layer always; cross_attn also for non-cross
    modes)."""
    import torch

    from test_tfam import CLASSES, LAYERS, TorchOracle, _config, _inputs
    from vimoclip_tpu.cli.convert import main as convert_main
    from vimoclip_tpu.models import TFAM

    rgb, motion, mask_rgb, mask_flow = _inputs(seed=5)
    model = TFAM(config=_config(mode), num_classes=CLASSES)
    params = model.init(
        jax.random.key(3), jnp.asarray(rgb), jnp.asarray(motion),
        jnp.asarray(mask_rgb), jnp.asarray(mask_flow),
    )["params"]
    _save_orbax_checkpoint(tmp_path / "ckpt", params,
                           {"epoch": 7, "best_metric": 0.61})

    out = str(tmp_path / "best_model.pth")
    assert convert_main([
        "tfam-to-torch", "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--out", out,
    ]) == 0

    payload = torch.load(out, weights_only=False)
    assert payload["epoch"] == 7
    assert payload["best_val_mAP"] == pytest.approx(0.61)

    oracle = TorchOracle(mode)
    oracle.load_state_dict(payload["state_dict"], strict=True)
    oracle.eval()

    with torch.no_grad():
        ref = oracle(
            torch.from_numpy(rgb), torch.from_numpy(motion),
            torch.from_numpy(mask_rgb), torch.from_numpy(mask_flow),
        ).numpy()
    ours = np.asarray(model.apply(
        {"params": params}, jnp.asarray(rgb), jnp.asarray(motion),
        jnp.asarray(mask_rgb), jnp.asarray(mask_flow), deterministic=True,
    ))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    # inferred depth matches the geometry we built
    n_layers = {k.split(".")[1] for k in payload["state_dict"]
                if k.startswith("layers.")}
    assert len(n_layers) == LAYERS


def test_convert_cli_student_end_to_end(tmp_path):
    """Orbax stage-1 best -> vimo-convert -> a bare torch state dict
    (train.py:174 layout) that converts back to the identical flax
    params; --module-prefix produces the DataParallel layout the
    reference's own checkpoints carry (inference.py:80-86)."""
    import torch

    from vimoclip_tpu.cli.convert import main as convert_main
    from vimoclip_tpu.models.student import StudentModel

    model = StudentModel(vision_config=VCFG, num_classes=5)
    params = model.init(
        jax.random.key(2), jnp.zeros((1, 3, 32, 32, 3), jnp.uint8)
    )["params"]
    _save_orbax_checkpoint(tmp_path / "ckpt", params, {"epoch": 1})

    out = str(tmp_path / "student_best.pth")
    assert convert_main([
        "student-to-torch", "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--out", out,
    ]) == 0
    state = torch.load(out, weights_only=False)
    assert isinstance(state, dict) and "state_dict" not in state  # bare
    back = student_params_from_torch(
        {k: v.numpy() for k, v in state.items()}, VCFG
    )
    _assert_trees_equal(params, back)

    out2 = str(tmp_path / "student_dp.pth")
    assert convert_main([
        "student-to-torch", "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--out", out2, "--module-prefix",
    ]) == 0
    dp = torch.load(out2, weights_only=False)
    assert all(k.startswith("module.") for k in dp)


def test_convert_cli_pointed_errors(tmp_path):
    from vimoclip_tpu.cli.convert import main as convert_main

    with pytest.raises(SystemExit, match="no checkpoint"):
        convert_main(["tfam-to-torch", "--checkpoint-dir",
                      str(tmp_path / "nope"), "--out", str(tmp_path / "x")])


def test_student_params_from_checkpoint_file(tmp_path):
    """The file-level loader accepts the reference's on-disk forms: a bare
    state dict and the DataParallel 'module.'-prefixed layout its
    checkpoints carry (inference.py:80-86) — this is what
    --student-torch-checkpoint / --torch-checkpoint feed."""
    import torch

    from vimoclip_tpu.models.student import StudentModel
    from vimoclip_tpu.models.torch_compat import (
        student_params_from_checkpoint,
    )

    model = StudentModel(vision_config=VCFG, num_classes=5)
    params = model.init(
        jax.random.key(4), jnp.zeros((1, 3, 32, 32, 3), jnp.uint8)
    )["params"]
    state = {k: torch.from_numpy(np.array(v))
             for k, v in student_params_to_torch(params, VCFG).items()}

    bare = str(tmp_path / "student_best.pth")
    torch.save(state, bare)
    cfg, loaded = student_params_from_checkpoint(bare, VCFG)
    assert cfg is VCFG
    _assert_trees_equal(params, loaded)

    dp = str(tmp_path / "student_dp.pth")
    torch.save({f"module.{k}": v for k, v in state.items()}, dp)
    # config=None: geometry is INFERRED from the checkpoint's own shapes
    # (image/patch/hidden/layers/ffn/proj; heads not recoverable — the
    # hidden//64 CLIP convention, clamped to 1 for this tiny fixture)
    inferred, loaded = student_params_from_checkpoint(dp)
    assert (inferred.image_size, inferred.patch_size,
            inferred.hidden_size, inferred.num_layers,
            inferred.intermediate_size, inferred.projection_dim) == \
        (VCFG.image_size, VCFG.patch_size, VCFG.hidden_size,
         VCFG.num_layers, VCFG.intermediate_size, VCFG.projection_dim)
    _assert_trees_equal(params, loaded)


def test_cli_student_flag_exclusivity():
    """predict/serve and the exporter each require exactly one student
    weight source."""
    from vimoclip_tpu.cli.export_motion_embeddings import main as export_main

    with pytest.raises(SystemExit):
        export_main(["--videos-dir", "/x", "--output", "/y.h5"])
    with pytest.raises(SystemExit):
        export_main(["--videos-dir", "/x", "--output", "/y.h5",
                     "--checkpoint-dir", "/a", "--torch-checkpoint", "/b"])

"""In-process drives of the stage-1 CLI mains (train_student and
export_motion_embeddings) on tiny fixtures — the full argparse-to-artifact
path, CPU devices."""

import os

import h5py
import numpy as np
import pytest
import torch

from vimoclip_tpu.data import EmbeddingWriter
from vimoclip_tpu.data.video_reader import write_video

D = 16


@pytest.fixture
def stage1_fixtures(tmp_path):
    """Teacher h5 + motion videos + a tiny HF CLIP checkpoint on disk."""
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    rng = np.random.default_rng(0)
    vdir = tmp_path / "motion"
    vdir.mkdir()
    h5 = str(tmp_path / "teacher.h5")
    with EmbeddingWriter(h5, num_classes=4, embed_dim=D) as w:
        for i in range(4):
            t = int(rng.integers(7, 11))
            write_video(str(vdir / f"v{i}.mp4"),
                        rng.integers(0, 256, (t - 1, 32, 48, 3), dtype=np.uint8))
            lab = np.zeros(4, np.float32)
            lab[i % 4] = 1
            w.write_video(f"v{i}.mp4",
                          rng.normal(size=(t, D)).astype(np.float32), labels=lab)
    torch.manual_seed(2)
    # 2 layers, not 1: ToMe merges BETWEEN layers, so the --token-merge CLI
    # arm needs at least one inter-layer merge point to be a real test
    hf = CLIPVisionModelWithProjection(HFConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8, projection_dim=D))
    ckpt = str(tmp_path / "clip.pt")
    torch.save(hf.state_dict(), ckpt)
    return h5, str(vdir), ckpt


def test_train_student_then_export_cli(stage1_fixtures, tmp_path):
    from vimoclip_tpu.cli.export_motion_embeddings import main as export_main
    from vimoclip_tpu.cli.train_student import main as train_main

    h5, vdir, clip_ckpt = stage1_fixtures
    ckpt_dir = str(tmp_path / "student_ckpt")
    train_main([
        "--train-embeddings", h5, "--val-embeddings", h5,
        "--motion-videos-dir", vdir,
        "--checkpoint-dir", ckpt_dir, "--log-dir", str(tmp_path / "logs"),
        "--clip-weights", clip_ckpt,
        "--epochs", "1", "--batch-size", "2", "--num-workers", "1",
        "--sequence-length", "5", "--num-classes", "4", "--float32",
        "--data-parallel", "2", "--model-parallel", "1",
    ])
    assert os.path.isdir(os.path.join(ckpt_dir, "best"))

    out_h5 = str(tmp_path / "motion_emb.h5")
    export_main([
        "--videos-dir", vdir, "--output", out_h5,
        "--checkpoint-dir", ckpt_dir, "--clip-weights", clip_ckpt,
        "--chunk-size", "8", "--float32", "--num-classes", "4",
    ])
    with h5py.File(out_h5, "r") as f:
        groups = [k for k in f if isinstance(f[k], h5py.Group)]
        assert len(groups) == 4
        assert f["v0"]["embeddings"].shape[1] == D
        assert f["v0"].attrs["complete"]
        baseline_v0 = f["v0"]["embeddings"][:]

    # full-circle migration (round 5): the trained checkpoint exported to
    # the reference's student_best.pth layout (vimo-convert), then driving
    # this exporter via --torch-checkpoint, must produce byte-identical
    # embeddings — train here, hand the .pth to a reference user, or take
    # theirs and export here, with zero drift
    from vimoclip_tpu.cli.convert import main as convert_main

    pth = str(tmp_path / "student_best.pth")
    assert convert_main([
        "student-to-torch", "--checkpoint-dir", ckpt_dir, "--out", pth,
        "--module-prefix",  # the DataParallel form reference ckpts carry
    ]) == 0
    torch_h5 = str(tmp_path / "motion_emb_torch.h5")
    export_main([
        "--videos-dir", vdir, "--output", torch_h5,
        "--torch-checkpoint", pth, "--clip-weights", clip_ckpt,
        "--chunk-size", "8", "--float32", "--num-classes", "4",
    ])
    with h5py.File(torch_h5, "r") as f:
        np.testing.assert_array_equal(f["v0"]["embeddings"][:], baseline_v0)

    # opt-in ToMe arm: merging tokens inside the student ViT must keep the
    # export schema/shapes identical (per-frame embeddings, not tokens) while
    # actually changing the numbers (proves the flag reaches the encoder)
    tome_h5 = str(tmp_path / "motion_emb_tome.h5")
    export_main([
        "--videos-dir", vdir, "--output", tome_h5,
        "--checkpoint-dir", ckpt_dir, "--clip-weights", clip_ckpt,
        "--chunk-size", "8", "--float32", "--num-classes", "4",
        "--token-merge", "4",
    ])
    with h5py.File(tome_h5, "r") as f:
        tome_v0 = f["v0"]["embeddings"][:]
        assert f["v0"].attrs["complete"]
    assert tome_v0.shape == baseline_v0.shape
    assert np.all(np.isfinite(tome_v0))
    assert not np.allclose(tome_v0, baseline_v0)

    # the two opt-in accelerators compose (one dataclasses.replace threads
    # both into the vision config) — the turbo arm bench.py measures
    turbo_h5 = str(tmp_path / "motion_emb_turbo.h5")
    export_main([
        "--videos-dir", vdir, "--output", turbo_h5,
        "--checkpoint-dir", ckpt_dir, "--clip-weights", clip_ckpt,
        "--chunk-size", "8", "--float32", "--num-classes", "4",
        "--token-merge", "4", "--quantize", "int8",
    ])
    with h5py.File(turbo_h5, "r") as f:
        turbo_v0 = f["v0"]["embeddings"][:]
        assert f["v0"].attrs["complete"]
    assert turbo_v0.shape == baseline_v0.shape
    assert np.all(np.isfinite(turbo_v0))
    # int8 on top of ToMe must change the numbers again
    assert not np.allclose(turbo_v0, tome_v0)


def test_predict_cli_end_to_end(stage1_fixtures, tmp_path):
    """vimo-predict: raw video file -> top-k JSON through the full fused
    cascade, with all three weight sources loaded from disk the way a user
    would (teacher .pt, student orbax 'best', TFAM orbax 'best')."""
    import json

    import jax
    import jax.numpy as jnp
    import yaml

    from vimoclip_tpu.cli.predict import main as predict_main
    from vimoclip_tpu.cli.train_student import main as train_main
    from vimoclip_tpu.config import TFAMModelConfig
    from vimoclip_tpu.models import TFAM
    from vimoclip_tpu.train.state import (
        CheckpointManager, TrainState, make_adamw,
    )

    h5, vdir, clip_ckpt = stage1_fixtures
    student_dir = str(tmp_path / "student_ckpt")
    train_main([
        "--train-embeddings", h5, "--val-embeddings", h5,
        "--motion-videos-dir", vdir,
        "--checkpoint-dir", student_dir, "--log-dir", str(tmp_path / "logs"),
        "--clip-weights", clip_ckpt,
        "--epochs", "1", "--batch-size", "2", "--num-workers", "1",
        "--sequence-length", "5", "--num-classes", "4", "--float32",
        "--data-parallel", "2", "--model-parallel", "1",
    ])

    # a trained-looking TFAM 'best' checkpoint (same tree the trainer saves)
    mcfg = TFAMModelConfig(d_model=D, nhead=2, num_layers=1,
                           dim_feedforward=32)
    tfam = TFAM(config=mcfg, num_classes=4)
    fparams = tfam.init(
        jax.random.key(5), jnp.zeros((1, 4, D)), jnp.zeros((1, 3, D)),
        jnp.ones((1, 4), bool), jnp.ones((1, 3), bool),
    )["params"]
    tfam_dir = str(tmp_path / "tfam_ckpt")
    state = TrainState.create(
        fparams, make_adamw(lambda s: 1e-4, weight_decay=0.1)
    )
    CheckpointManager(tfam_dir).save(state, "best")

    names_csv = tmp_path / "classes.csv"
    names_csv.write_text("0,eat\n1,swim\n2,run\n3,sleep\n")
    cfg_yaml = tmp_path / "tfam.yaml"
    cfg_yaml.write_text(yaml.safe_dump({
        "training": {"lr": "1e-4"},
        "model": {"d_model": D, "nhead": 2, "num_layers": 1,
                  "dim_feedforward": 32},
        "data": {"num_classes": 4, "class_names_dir": str(names_csv),
                 "length_bucket": 4},
    }))

    out_json = str(tmp_path / "preds.json")
    video = os.path.join(vdir, "v0.mp4")
    predict_main([
        video,
        "--teacher-weights", clip_ckpt,
        "--student-checkpoint-dir", student_dir,
        "--student-clip-weights", clip_ckpt,
        "--tfam-config", str(cfg_yaml),
        "--tfam-checkpoint-dir", tfam_dir,
        "--top-k", "3", "--output", out_json, "--frame-batch", "8",
        "--float32",
    ])
    results = json.load(open(out_json))
    assert len(results) == 1
    preds = results[0]["predictions"]
    assert len(preds) == 3
    assert preds[0]["class_name"] in {"eat", "swim", "run", "sleep"}
    probs = [p["probability"] for p in preds]
    assert all(0.0 <= p <= 1.0 for p in probs)
    assert probs == sorted(probs, reverse=True)

    # turbo + guard rail: the student probe must run on the student's REAL
    # input distribution — frame-diff frames, not raw RGB (fidelity.py
    # sample_motion_probe_frames). Recorded via a wrapper because
    # setup_logging(force=True) inside main drops any pre-attached capture
    # handler.
    import vimoclip_tpu.fidelity as fid

    calls = []
    real_check = fid.check_encoder_fidelity

    def recording_check(params, cfg2, probe, n, thr, **kw):
        calls.append((kw.get("encoder_name"), kw.get("frames")))
        return real_check(params, cfg2, probe, n, thr, **kw)

    fid.check_encoder_fidelity = recording_check
    try:
        predict_main([
            video,
            "--teacher-weights", clip_ckpt,
            "--student-checkpoint-dir", student_dir,
            "--student-clip-weights", clip_ckpt,
            "--tfam-config", str(cfg_yaml),
            "--tfam-checkpoint-dir", tfam_dir,
            "--top-k", "3", "--frame-batch", "8", "--float32",
            "--quantize", "int8", "--verify-fidelity", "3",
            "--fidelity-threshold", "0.5",
        ])
    finally:
        fid.check_encoder_fidelity = real_check
    by_name = dict(calls)
    assert "teacher ViT" in by_name and by_name["teacher ViT"] is None, calls
    student_frames = by_name["student ViT (frame-diff probe)"]
    # the probe frames ARE consecutive-pair diffs of the decoded video
    from vimoclip_tpu.data.video_reader import read_video
    from vimoclip_tpu.ops.preprocess import frame_diff

    all_diffs = np.asarray(frame_diff(jnp.asarray(read_video(video))))
    assert student_frames is not None and all(
        any(np.array_equal(f, d) for d in all_diffs) for f in student_frames
    )

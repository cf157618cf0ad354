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
    hf = CLIPVisionModelWithProjection(HFConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
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

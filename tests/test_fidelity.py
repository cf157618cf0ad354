"""Runtime fidelity probe for the turbo flags (fidelity.py, VERDICT r3 #5):
a user passing --quantize/--token-merge on a REAL checkpoint sees THEIR
cosine, not the random-init docs pin — and the run aborts below threshold
(the reference's implicit contract is exact embeddings,
/root/reference/extract_embeddings.py:94)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from vimoclip_tpu.fidelity import (
    FidelityError,
    check_encoder_fidelity,
    encoder_fidelity_probe,
    sample_video_frames,
)
from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder

CFG = ClipVisionConfig(
    image_size=32, patch_size=8, hidden_size=64, num_layers=2,
    num_heads=4, intermediate_size=128, projection_dim=32,
)


@pytest.fixture(scope="module")
def params():
    import jax.numpy as jnp

    return ClipVisionEncoder(CFG).init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )["params"]


@pytest.fixture(scope="module")
def frames():
    return np.random.default_rng(0).integers(
        0, 256, (4, 40, 48, 3), dtype=np.uint8
    )


def test_probe_int8_reports_high_cosine(params, frames):
    report = encoder_fidelity_probe(
        params, dataclasses.replace(CFG, matmul_quant="int8"), frames,
        half_precision=False,
    )
    assert report["config"] == "int8"
    assert report["n_frames"] == 4
    assert 0.99 < report["cosine_min"] <= 1.0 + 1e-9, report
    assert report["cosine_mean"] >= report["cosine_min"]


def test_probe_tome_reports_degradation(params, frames):
    """ToMe on a tiny 16-token geometry degrades hard — exactly the case
    the probe exists to surface (random-init pins use 197 tokens)."""
    report = encoder_fidelity_probe(
        params, dataclasses.replace(CFG, token_merge_r=2), frames,
        half_precision=False,
    )
    assert "tome2" in report["config"]
    assert report["cosine_min"] < 1.0  # it measurably changed something


def test_probe_requires_an_approximation(params, frames):
    with pytest.raises(ValueError, match="no approximation"):
        encoder_fidelity_probe(params, CFG, frames)


def test_check_aborts_below_threshold(params, frames, tmp_path):
    from vimoclip_tpu.data.video_reader import write_video

    video = str(tmp_path / "probe.mp4")
    write_video(video, frames)
    qcfg = dataclasses.replace(CFG, matmul_quant="int8")
    report = check_encoder_fidelity(
        params, qcfg, video, 3, threshold=0.5, half_precision=False
    )
    assert report["cosine_min"] > 0.5
    with pytest.raises(FidelityError, match="below --fidelity-threshold"):
        check_encoder_fidelity(
            params, qcfg, video, 3, threshold=1.0, half_precision=False
        )


def test_sample_video_frames_uniform(tmp_path):
    from vimoclip_tpu.data.video_reader import write_video

    video = str(tmp_path / "clip.mp4")
    write_video(
        video,
        np.random.default_rng(1).integers(0, 256, (11, 32, 32, 3),
                                          dtype=np.uint8),
    )
    out = sample_video_frames(video, 4)
    assert out.shape == (4, 32, 32, 3)
    # n larger than the clip: every frame once, no duplicates
    out_all = sample_video_frames(video, 50)
    assert out_all.shape[0] == 11


def test_sample_motion_probe_frames_are_consecutive_diffs(tmp_path):
    """The predict/serve student probe must sample the student's ACTUAL
    input distribution — BT.601 absdiff of consecutive decoded frames, the
    same op the serving cascade feeds it — not raw RGB frames."""
    import jax.numpy as jnp

    from vimoclip_tpu.data.video_reader import read_video, write_video
    from vimoclip_tpu.fidelity import sample_motion_probe_frames
    from vimoclip_tpu.ops.preprocess import frame_diff

    video = str(tmp_path / "clip.mp4")
    write_video(
        video,
        np.random.default_rng(2).integers(0, 256, (9, 32, 32, 3),
                                          dtype=np.uint8),
    )
    out = sample_motion_probe_frames(video, 4)
    assert out.shape == (4, 32, 32, 3) and out.dtype == np.uint8
    # each probe frame IS frame_diff of a consecutive decoded pair
    decoded = read_video(video)
    all_diffs = np.asarray(frame_diff(jnp.asarray(decoded)))
    assert all(
        any(np.array_equal(f, d) for d in all_diffs) for f in out
    )
    # 1-frame video: no pairs to diff
    short = str(tmp_path / "short.mp4")
    write_video(short, np.zeros((1, 32, 32, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="2 frames"):
        sample_motion_probe_frames(short, 4)


def test_extract_cli_verify_fidelity(tmp_path):
    """--verify-fidelity on the extraction CLI: passes at a sane threshold,
    aborts the run (before any HDF5 is written) at an impossible one."""
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    from vimoclip_tpu.cli.extract_embeddings import main
    from vimoclip_tpu.data.video_reader import write_video

    rng = np.random.default_rng(5)
    root = str(tmp_path / "videos")
    os.makedirs(root)
    write_video(os.path.join(root, "v0.mp4"),
                rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8))
    ann = str(tmp_path / "train.txt")
    with open(ann, "w") as f:
        f.write("v0.mp4 0\n")
    cls = str(tmp_path / "classes.csv")
    with open(cls, "w") as f:
        f.write("id,name\n0,run\n")
    torch.manual_seed(2)
    hf = CLIPVisionModelWithProjection(HFConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=16))
    ckpt = str(tmp_path / "clip.pt")
    torch.save(hf.state_dict(), ckpt)

    base = [
        "--data-root", root, "--annotation-file", ann, "--class-file", cls,
        "--clip-weights", ckpt, "--batch-size", "8", "--split", "train",
        "--float32", "--quantize", "int8", "--verify-fidelity", "3",
    ]
    ok_out = str(tmp_path / "ok.h5")
    main(base + ["--output", ok_out, "--fidelity-threshold", "0.5"])
    assert os.path.exists(ok_out)

    bad_out = str(tmp_path / "bad.h5")
    with pytest.raises(FidelityError):
        main(base + ["--output", bad_out, "--fidelity-threshold", "1.0"])
    assert not os.path.exists(bad_out)  # aborted before any write


def test_extract_cli_probe_shard_aware_and_decode_tolerant(tmp_path):
    """The probe samples THIS shard's corpus and skips unreadable files the
    way extraction itself does (warn + continue) — a missing first video
    must not abort a job that extraction would have completed."""
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    from vimoclip_tpu.cli.extract_embeddings import main
    from vimoclip_tpu.data.video_reader import write_video

    rng = np.random.default_rng(6)
    root = str(tmp_path / "videos")
    os.makedirs(root)
    # v0 is annotated but MISSING on disk; v1/v2 exist. With 2 shards,
    # shard 0 sees (v0, v2): probe must skip v0 and succeed on v2.
    for name in ("v1.mp4", "v2.mp4"):
        write_video(os.path.join(root, name),
                    rng.integers(0, 256, (6, 32, 32, 3), dtype=np.uint8))
    ann = str(tmp_path / "train.txt")
    with open(ann, "w") as f:
        f.write("v0.mp4 0\nv1.mp4 0\nv2.mp4 0\n")
    cls = str(tmp_path / "classes.csv")
    with open(cls, "w") as f:
        f.write("id,name\n0,run\n")
    torch.manual_seed(3)
    hf = CLIPVisionModelWithProjection(HFConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8,
        projection_dim=16))
    ckpt = str(tmp_path / "clip.pt")
    torch.save(hf.state_dict(), ckpt)

    out = str(tmp_path / "shard0.h5")
    main([
        "--data-root", root, "--annotation-file", ann, "--class-file", cls,
        "--clip-weights", ckpt, "--batch-size", "8", "--split", "train",
        "--float32", "--quantize", "int8", "--verify-fidelity", "3",
        "--fidelity-threshold", "0.5", "--num-shards", "2",
        "--shard-index", "0", "--output", out,
    ])
    assert os.path.exists(out)

    # a shard with NO readable video fails loudly, naming the situation
    ann_bad = str(tmp_path / "bad.txt")
    with open(ann_bad, "w") as f:
        f.write("missing_a.mp4 0\nmissing_b.mp4 0\n")
    with pytest.raises(RuntimeError, match="no readable video"):
        main([
            "--data-root", root, "--annotation-file", ann_bad,
            "--class-file", cls, "--clip-weights", ckpt,
            "--batch-size", "8", "--split", "train", "--float32",
            "--quantize", "int8", "--verify-fidelity", "3",
            "--output", str(tmp_path / "never.h5"),
        ])

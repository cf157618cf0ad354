"""Tests for the motion-embedding exporter (streaming, resume, error attrs)
and the offline motion-video generators."""

import os

import cv2
import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vimoclip_tpu.data.video_reader import read_video, write_video
from vimoclip_tpu.export import (
    LowMemoryError,
    MotionEmbeddingExporter,
    find_motion_videos,
    memory_guard,
)
from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
from vimoclip_tpu.motion import (
    generate_frame_diff_video,
    generate_optical_flow_video,
    process_video_list,
)
from vimoclip_tpu.ops.preprocess import clip_preprocess

CFG = ClipVisionConfig(
    image_size=32, patch_size=8, hidden_size=32, num_layers=1,
    num_heads=2, intermediate_size=64, projection_dim=16,
)


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    root = tmp_path_factory.mktemp("motion_videos")
    rng = np.random.default_rng(0)
    for vid, t in [("x.mp4", 7), ("y.mp4", 12)]:
        write_video(str(root / vid), rng.integers(0, 256, (t, 36, 64, 3), dtype=np.uint8))
    return str(root)


@pytest.fixture(scope="module")
def params():
    p = ClipVisionEncoder(CFG).init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )["params"]
    return {"visual_encoder": p}


def test_find_motion_videos(videos):
    assert [os.path.basename(p) for p in find_motion_videos(videos)] == ["x.mp4", "y.mp4"]


def test_export_matches_direct_forward(videos, params, tmp_path):
    out = str(tmp_path / "motion.h5")
    exp = MotionEmbeddingExporter(params, CFG, chunk_size=5, half_precision=False)
    counts = exp.export(find_motion_videos(videos), out)
    assert counts == {"processed": 2, "skipped": 0, "errors": 0}

    enc = ClipVisionEncoder(CFG)
    with h5py.File(out, "r") as f:
        for vid in ("x", "y"):
            emb = f[vid]["embeddings"][:]
            frames = read_video(os.path.join(videos, f"{vid}.mp4"))
            ref = np.asarray(
                enc.apply({"params": params["visual_encoder"]},
                          clip_preprocess(jnp.asarray(frames), 32))
            )
            assert emb.shape == ref.shape
            np.testing.assert_allclose(emb, ref, rtol=1e-4, atol=1e-5)
            assert f[vid].attrs["complete"]
            assert f[vid]["embeddings"].compression == "lzf"


def test_export_resume_and_errors(videos, params, tmp_path):
    out = str(tmp_path / "motion.h5")
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"garbage")
    exp = MotionEmbeddingExporter(params, CFG, chunk_size=5, half_precision=False)
    counts = exp.export(find_motion_videos(videos) + [str(bad)], out)
    assert counts["processed"] == 2 and counts["errors"] == 1
    with h5py.File(out, "r") as f:
        assert "error" in f["bad"].attrs
        assert not f["bad"].attrs["complete"]
    # resume: good videos skipped, bad retried (still failing)
    counts2 = exp.export(find_motion_videos(videos) + [str(bad)], out)
    assert counts2 == {"processed": 0, "skipped": 2, "errors": 1}


def test_export_rejects_colliding_stems(params, tmp_path):
    """Groups are keyed by basename stem while discovery globs recursively
    (nested MammalNet layouts) — a/clip.mp4 vs b/clip.mp4 must fail up
    front instead of the second silently reading as a resume skip."""
    rng = np.random.default_rng(4)
    paths = []
    for sub in ("a", "b"):
        d = tmp_path / sub
        d.mkdir()
        p = str(d / "clip001.mp4")
        write_video(p, rng.integers(0, 256, (5, 36, 64, 3), dtype=np.uint8))
        paths.append(p)
    exp = MotionEmbeddingExporter(params, CFG, chunk_size=4,
                                  half_precision=False)
    with pytest.raises(ValueError, match="duplicate video id"):
        exp.export(paths, str(tmp_path / "out.h5"))
    # the same path listed twice is NOT a collision (idempotent lists)
    out = exp.export([paths[0], paths[0]], str(tmp_path / "out2.h5"))
    assert out["processed"] == 1 and out["skipped"] == 1


def test_memory_guard():
    memory_guard(0.0)  # always passes
    with pytest.raises(LowMemoryError):
        memory_guard(float("inf"))


def test_generate_frame_diff_video(videos, tmp_path):
    src = os.path.join(videos, "x.mp4")
    dst_dev = str(tmp_path / "diff_dev.mp4")
    dst_host = str(tmp_path / "diff_host.mp4")
    n1 = generate_frame_diff_video(src, dst_dev, on_device=True)
    n2 = generate_frame_diff_video(src, dst_host, on_device=False)
    assert n1 == n2 == 6  # 7 frames -> 6 diffs
    a = read_video(dst_dev)
    b = read_video(dst_host)
    assert a.shape == b.shape == (6, 36, 64, 3)
    # both encodings of the (nearly) identical diff signal
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0


def test_generate_optical_flow_video(videos, tmp_path):
    src = os.path.join(videos, "y.mp4")
    dst = str(tmp_path / "flow.mp4")
    n = generate_optical_flow_video(src, dst)
    assert n == 11
    v = read_video(dst)
    assert v.shape == (11, 36, 64, 3)


def test_process_video_list(videos, tmp_path):
    lst = tmp_path / "list.txt"
    lst.write_text("x.mp4\ny.mp4\nmissing.mp4\n")
    out_dir = str(tmp_path / "diffs")
    errors = process_video_list(str(lst), videos, out_dir, kind="frame_diff")
    assert set(errors) == {"missing.mp4"}
    assert sorted(os.listdir(out_dir)) == ["x.mp4", "y.mp4"]
    # skip_existing: second run does nothing and keeps files
    errors2 = process_video_list(str(lst), videos, out_dir, kind="frame_diff")
    assert set(errors2) == {"missing.mp4"}


def test_export_resume_retries_crash_truncated_group(videos, params, tmp_path):
    """A group with embeddings but NO attrs (process died between chunk
    write and finalize — no exception handler ran) must be retried on
    resume, not skipped forever with partial data (round-1 ADVICE)."""
    import h5py

    from vimoclip_tpu.export import MotionEmbeddingExporter

    exporter = MotionEmbeddingExporter(params, CFG, chunk_size=4,
                                       half_precision=False)
    out = str(tmp_path / "crash.h5")
    first = find_motion_videos(videos)[0]
    vid = os.path.splitext(os.path.basename(first))[0]
    # simulate the crash artifact: partial embeddings, no 'complete' attr
    with h5py.File(out, "w") as f:
        g = f.create_group(vid)
        g.create_dataset("embeddings", data=np.zeros((2, 16), np.float32),
                         maxshape=(None, 16))
    counts = exporter.export([first], out)
    assert counts == {"processed": 1, "skipped": 0, "errors": 0}
    with h5py.File(out, "r") as f:
        g = f[vid]
        assert g.attrs["complete"]
        assert g["embeddings"].shape[0] == g.attrs["total_frames"] > 2
    # and a genuine resume still skips the now-complete group
    counts = exporter.export([first], out)
    assert counts == {"processed": 0, "skipped": 1, "errors": 0}


def test_export_resume_trusts_reference_written_groups(videos, params, tmp_path):
    """Reference-pipeline HDF5 files never write a 'complete' attr but DO
    finalize with total_frames (inference_frame_diff.py) — resume must skip
    those, while still retrying our crash artifacts (no attrs at all)."""
    import h5py

    from vimoclip_tpu.export import MotionEmbeddingExporter

    out = str(tmp_path / "ref.h5")
    paths = find_motion_videos(videos)
    ref_vid = os.path.splitext(os.path.basename(paths[0]))[0]
    with h5py.File(out, "w") as f:
        g = f.create_group(ref_vid)  # reference-style finalized group
        g.create_dataset("embeddings", data=np.zeros((7, 16), np.float32))
        g.attrs["total_frames"] = 7
    exporter = MotionEmbeddingExporter(params, CFG, chunk_size=4,
                                       half_precision=False)
    counts = exporter.export(paths, out)
    assert counts["skipped"] == 1  # the reference-written group
    assert counts["processed"] == len(paths) - 1
    with h5py.File(out, "r") as f:
        # untouched reference group (would be (7,16) zeros only if skipped)
        np.testing.assert_array_equal(f[ref_vid]["embeddings"][:], 0.0)

"""Data-layer tests: HDF5 schema round-trip + structure checker, paired
embedding dataset + collate, segment dataset against synthetic fixtures,
batch loader determinism, device prefetch."""

import os

import h5py
import numpy as np
import pytest

from vimoclip_tpu.data import (
    BatchLoader,
    EmbeddingWriter,
    PairedEmbeddingDataset,
    SegmentDataset,
    analyze_structure,
    collate_pad,
    compare_structures,
    prefetch_to_device,
    sparse_sample_indices,
)
from vimoclip_tpu.data.hdf5_schema import AsyncWriter, sequence_lengths
from vimoclip_tpu.data.segment_dataset import build_segment_index, collate_segments
from vimoclip_tpu.data.video_reader import read_video, read_video_window, write_video

D = 16


@pytest.fixture
def rgb_h5(tmp_path):
    path = str(tmp_path / "rgb.h5")
    rng = np.random.default_rng(0)
    with EmbeddingWriter(path, num_classes=5, split="train", embed_dim=D) as w:
        for vid, t in [("a.mp4", 7), ("b.mp4", 4), ("c.mp4", 12)]:
            w.write_video(
                vid,
                rng.normal(size=(t, D)).astype(np.float32),
                labels=(rng.random(5) < 0.4).astype(np.float32),
            )
    return path


@pytest.fixture
def motion_h5(tmp_path, rgb_h5):
    path = str(tmp_path / "motion.h5")
    rng = np.random.default_rng(1)
    with EmbeddingWriter(path, embed_dim=D) as w:
        for vid, t in [("a", 6), ("b", 3), ("c", 11)]:
            w.write_video(vid, rng.normal(size=(t, D)).astype(np.float32))
    return path


def test_writer_roundtrip_and_attrs(rgb_h5):
    with h5py.File(rgb_h5, "r") as f:
        assert f.attrs["num_classes"] == 5
        assert f.attrs["type"] == "train"
        assert set(f["a.mp4"].keys()) == {"embeddings", "labels"}
        assert f["a.mp4"]["embeddings"].shape == (7, D)
        assert f["a.mp4"].attrs["total_frames"] == 7
        assert list(f["video_ids"].asstr()[:]) == ["a.mp4", "b.mp4", "c.mp4"]
        assert f["a.mp4"]["embeddings"].compression == "gzip"


def test_streaming_writer_and_resume(tmp_path):
    path = str(tmp_path / "stream.h5")
    with EmbeddingWriter(path, embed_dim=D, nested_prefix="trimmed_videos") as w:
        s = w.open_stream("v1", chunk_rows=4)
        s.append(np.ones((3, D)))
        s.append(2 * np.ones((5, D)))
        s.finalize(original_frames=8)
        assert w.has_video("v1")
        assert not w.has_video("v2")
        w.annotate_error("v2", "decode failed")
    with h5py.File(path, "r") as f:
        ds = f["trimmed_videos/v1/embeddings"]
        assert ds.shape == (8, D)
        assert ds[0, 0] == 1 and ds[-1, 0] == 2
        assert f["trimmed_videos/v1"].attrs["total_frames"] == 8
        assert f["trimmed_videos/v2"].attrs["error"] == "decode failed"
    # resume: reopen append-mode, v1 skipped
    with EmbeddingWriter(path, mode="a", embed_dim=D, nested_prefix="trimmed_videos") as w:
        assert w.has_video("v1")


def test_streaming_finalize_preserves_explicit_zero_original_frames(tmp_path):
    """finalize(original_frames=0) must be kept verbatim (None-only
    fallback, matching write_video): 0 means the source header reported no
    frames, not 'substitute the streamed row count'."""
    path = str(tmp_path / "zero.h5")
    with EmbeddingWriter(path, embed_dim=D) as w:
        s = w.open_stream("v1", chunk_rows=4)
        s.append(np.ones((3, D)))
        s.finalize(original_frames=0)
        s2 = w.open_stream("v2", chunk_rows=4)
        s2.append(np.ones((2, D)))
        s2.finalize()  # None -> streamed row count
    with h5py.File(path, "r") as f:
        assert f["v1"].attrs["original_frames"] == 0
        assert f["v2"].attrs["original_frames"] == 2


def test_async_writer(tmp_path):
    path = str(tmp_path / "async.h5")
    w = AsyncWriter(EmbeddingWriter(path, embed_dim=D))
    for i in range(20):
        w.submit(f"v{i:02d}", np.full((3, D), i, dtype=np.float32))
    w.close()
    with h5py.File(path, "r") as f:
        assert len([k for k in f if isinstance(f[k], h5py.Group)]) == 20
        assert f["v07"]["embeddings"][0, 0] == 7


def test_structure_checker(rgb_h5, motion_h5, tmp_path):
    a, b = analyze_structure(rgb_h5), analyze_structure(rgb_h5)
    ok, issues = compare_structures(a, b)
    assert ok and not issues
    # rgb has labels, motion doesn't -> mismatch
    ok, issues = compare_structures(a, analyze_structure(motion_h5))
    assert not ok and any("dataset_names" in i for i in issues)


def test_sparse_sample_indices_matches_torch():
    import torch

    for t, n in [(100, 30), (31, 30), (450, 64)]:
        ref = torch.linspace(0, t - 1, n).long().numpy()
        np.testing.assert_array_equal(sparse_sample_indices(t, n), ref)


def test_paired_dataset_and_collate(rgb_h5, motion_h5):
    ds = PairedEmbeddingDataset(rgb_h5, motion_h5)
    assert len(ds) == 3
    item = ds[0]
    assert item["video_id"] == "a.mp4"
    assert item["embeddings"].shape == (7, D)
    assert item["motion_embeddings"].shape == (6, D)  # key "a" = "a.mp4" stripped
    assert item["labels"].shape == (5,)

    batch = collate_pad([ds[i] for i in range(3)])
    assert batch["embeddings"].shape == (3, 12, D)
    assert batch["motion_embeddings"].shape == (3, 11, D)
    np.testing.assert_array_equal(batch["mask_rgb"].sum(1), [7, 4, 12])
    np.testing.assert_array_equal(batch["mask_motion"].sum(1), [6, 3, 11])
    # pads are zero
    assert batch["embeddings"][1, 4:].sum() == 0
    ds.close()


def test_collate_bucketing(rgb_h5, motion_h5):
    ds = PairedEmbeddingDataset(rgb_h5, motion_h5)
    batch = collate_pad([ds[i] for i in range(3)], bucket=8)
    assert batch["embeddings"].shape[1] == 16  # 12 -> next multiple of 8
    assert batch["mask_rgb"].shape == (3, 16)
    np.testing.assert_array_equal(batch["mask_rgb"].sum(1), [7, 4, 12])
    ds.close()


def test_paired_dataset_filters(rgb_h5, motion_h5):
    ds = PairedEmbeddingDataset(rgb_h5, motion_h5, max_frames=10)
    assert sorted(ds.keys) == ["a.mp4", "b.mp4"]  # c has 12 >= 10
    ds = PairedEmbeddingDataset(rgb_h5, motion_h5, num_frames=5)
    item = ds[2]  # c: 12 rgb frames -> 5
    assert item["embeddings"].shape == (5, D)
    assert item["motion_embeddings"].shape == (5, D)
    ds.close()


@pytest.fixture
def motion_video_dir(tmp_path):
    vdir = tmp_path / "videos"
    vdir.mkdir()
    rng = np.random.default_rng(3)
    for vid, t in [("a.mp4", 6), ("b.mp4", 3), ("c.mp4", 11)]:
        frames = rng.integers(0, 256, (t, 32, 48, 3), dtype=np.uint8)
        write_video(str(vdir / vid), frames)
    return str(vdir)


def test_video_io_roundtrip(motion_video_dir):
    v = read_video(os.path.join(motion_video_dir, "a.mp4"))
    assert v.shape == (6, 32, 48, 3) and v.dtype == np.uint8
    w = read_video_window(os.path.join(motion_video_dir, "a.mp4"), 2, 3)
    assert w.shape == (3, 32, 48, 3)
    np.testing.assert_array_equal(w, v[2:5])


def test_segment_index():
    idx = build_segment_index({"v": 10}, 4)
    assert idx == [("v", 0, 4), ("v", 4, 4), ("v", 8, 2)]
    assert build_segment_index({"z": 0}, 4) == []


def test_segment_dataset(rgb_h5, motion_video_dir):
    ds = SegmentDataset(rgb_h5, motion_video_dir, sequence_length=5)
    # a:7 -> [0:5],[5:2pad]; b:4 -> [0:4pad]; c:12 -> [0:5],[5:5],[10:2pad]
    assert len(ds) == 6
    item = ds[0]
    assert item["rgb_emb"].shape == (5, D)
    assert item["motion_frames"].shape == (4, 32, 48, 3)
    assert item["labels"].shape == (5,)

    # padded segment: a's remainder [5:7) -> rgb padded by repeat-last
    item2 = ds[1]
    assert item2["rgb_emb"].shape == (5, D)
    np.testing.assert_array_equal(item2["rgb_emb"][2], item2["rgb_emb"][4])
    assert item2["motion_frames"].shape == (4, 32, 48, 3)

    batch = collate_segments([ds[0], ds[2]])
    assert batch["rgb_emb"].shape == (2, 5, D)
    assert batch["motion_frames"].shape == (2, 4, 32, 48, 3)


def test_batch_loader_determinism(rgb_h5, motion_h5):
    ds = PairedEmbeddingDataset(rgb_h5, motion_h5)
    dl1 = BatchLoader(ds, 2, collate_pad, shuffle=True, seed=49, num_workers=2)
    dl2 = BatchLoader(ds, 2, collate_pad, shuffle=True, seed=49, num_workers=1)
    ids1 = [b["video_id"] for b in dl1]
    ids2 = [b["video_id"] for b in dl2]
    assert ids1 == ids2
    dl2.set_epoch(1)
    assert [b["video_id"] for b in dl2] != ids1 or len(ids1) == 1

    dl3 = BatchLoader(ds, 2, collate_pad, drop_last=True)
    assert len(dl3) == 1
    assert len(list(dl3)) == 1


def test_prefetch_to_device(rgb_h5, motion_h5, mesh8):
    import jax

    from vimoclip_tpu.parallel import batch_sharding

    ds = PairedEmbeddingDataset(rgb_h5, motion_h5)
    # batch of 4 (divisible by the data=4 mesh axis)
    host_batches = [collate_pad([ds[i % 3] for i in range(4)], bucket=4)]
    batches = list(prefetch_to_device(host_batches, sharding=batch_sharding(mesh8)))
    assert len(batches) == 1
    b = batches[0]
    assert isinstance(b["embeddings"], jax.Array)
    assert b["embeddings"].sharding.spec == batch_sharding(mesh8).spec
    assert isinstance(b["video_id"], list)


def test_video_ids_rebuilt_on_append_resume(tmp_path):
    """Resumed (mode='a') writes must leave a self-consistent video_ids
    index covering OLD + NEW groups (round-1 VERDICT weak #5: the index
    went stale or incomplete after resume)."""
    path = str(tmp_path / "resume.h5")
    with EmbeddingWriter(path, embed_dim=D, num_classes=3) as w:
        w.write_video("a.mp4", np.zeros((4, D), np.float32))
        w.write_video("b.mp4", np.zeros((2, D), np.float32))
    with EmbeddingWriter(path, embed_dim=D, mode="a") as w:
        assert w.has_video("a.mp4")
        w.write_video("c.mp4", np.zeros((3, D), np.float32))
    with h5py.File(path, "r") as f:
        assert sorted(f["video_ids"].asstr()[:]) == ["a.mp4", "b.mp4", "c.mp4"]
        assert {k for k in f if isinstance(f[k], h5py.Group)} == \
            {"a.mp4", "b.mp4", "c.mp4"}


def test_video_ids_explicit_override_and_delete(tmp_path):
    """set_video_ids pins the AK all-annotated-ids semantic
    (extract_embeddings.py:118-119); delete_video rolls back a group."""
    path = str(tmp_path / "ak.h5")
    with EmbeddingWriter(path, embed_dim=D) as w:
        w.write_video("ok.mp4", np.zeros((2, D), np.float32))
        w.write_video("partial.mp4", np.zeros((1, D), np.float32))
        w.delete_video("partial.mp4")
        w.set_video_ids(["ok.mp4", "partial.mp4", "missing.mp4"])
    with h5py.File(path, "r") as f:
        assert list(f["video_ids"].asstr()[:]) == \
            ["ok.mp4", "partial.mp4", "missing.mp4"]
        assert "partial.mp4" not in f


def test_async_writer_streaming_error_surfaces(tmp_path):
    """A failure inside a streamed append on the writer thread must surface
    on the next submit/close, not vanish (AsyncWriter error contract)."""
    import pytest

    from vimoclip_tpu.data.hdf5_schema import AsyncWriter

    path = str(tmp_path / "s.h5")
    aw = AsyncWriter(EmbeddingWriter(path, embed_dim=D))
    aw.submit_chunk("v", np.zeros((4, D), np.float32))
    aw.submit_chunk("v", np.zeros((4, D + 3), np.float32))  # wrong dim -> h5py error
    with pytest.raises(Exception):
        aw.close()


def test_async_writer_streaming_roundtrip(tmp_path):
    """submit_chunk/finalize_video through the writer thread produce the
    same layout as a direct open_stream, incl. labels and attrs."""
    from vimoclip_tpu.data.hdf5_schema import AsyncWriter

    path = str(tmp_path / "r.h5")
    aw = AsyncWriter(EmbeddingWriter(path, embed_dim=D, num_classes=3))
    aw.submit_chunk("v1", np.ones((4, D), np.float32))
    aw.submit_chunk("v1", 2 * np.ones((2, D), np.float32))
    lab = np.array([0, 1, 0], np.float32)
    aw.finalize_video("v1", labels=lab, original_frames=10)
    aw.submit("v2", np.zeros((3, D), np.float32))  # whole-video interleaved
    aw.abort_video("v1_missing")  # abort of unknown vid is a no-op
    aw.close()
    with h5py.File(path, "r") as f:
        assert f["v1"]["embeddings"].shape == (6, D)
        np.testing.assert_array_equal(f["v1"]["embeddings"][4:], 2.0)
        np.testing.assert_array_equal(f["v1"]["labels"][:], lab)
        assert f["v1"].attrs["total_frames"] == 6
        assert f["v1"].attrs["original_frames"] == 10
        assert f["v2"]["embeddings"].shape == (3, D)
        assert sorted(f["video_ids"].asstr()[:]) == ["v1", "v2"]


def test_segment_dataset_cache_off_by_default_and_lru_thread_safe(
    rgb_h5, motion_video_dir
):
    """The decode cache defaults OFF (under the shuffled train loader its
    hit rate is ~0 and every miss would full-decode a video for one
    window); the opt-in cache is a real LRU whose eviction under
    concurrent workers never KeyErrors, and both paths agree."""
    import concurrent.futures

    ds_seek = SegmentDataset(rgb_h5, motion_video_dir, sequence_length=5)
    assert ds_seek._cache_size == 0  # seek path is the default

    ds = SegmentDataset(rgb_h5, motion_video_dir, sequence_length=5,
                        decode_cache_videos=1)
    expect = [ds_seek[i]["motion_frames"] for i in range(len(ds_seek))]

    def read_all(seed):
        idxs = np.random.default_rng(seed).permutation(len(ds))
        for i in idxs:
            np.testing.assert_array_equal(
                ds[int(i)]["motion_frames"], expect[int(i)]
            )

    # many workers + cache of ONE video across three videos: constant
    # eviction contention (workers must hold a local reference)
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        list(ex.map(read_all, range(12)))
    assert len(ds._cache) <= 1


def test_segment_dataset_zero_frame_motion_video_fails_pointedly(
    rgb_h5, tmp_path
):
    """An undecodable/empty motion video must raise an error NAMING the
    video, on both the seek and the cached path, instead of an opaque
    IOError (or a crash deep in np.stack)."""
    vdir = tmp_path / "motion_bad"
    vdir.mkdir()
    for name in sequence_lengths(rgb_h5):  # the dataset's own key scheme
        (vdir / name).write_bytes(b"")  # zero-byte "video"
    for cache in (0, 1):
        ds = SegmentDataset(rgb_h5, str(vdir), sequence_length=5,
                            decode_cache_videos=cache)
        with pytest.raises(ValueError, match="decoded 0 frames"):
            ds[0]

"""Extraction-pipeline tests: the batched decode->preprocess->embed->write
pipeline must produce per-video embeddings identical to a simple sequential
reference computation, with the reference HDF5 layout."""

import os

import h5py
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vimoclip_tpu.data.video_reader import read_video, write_video
from vimoclip_tpu.extraction import (
    ClipExtractor,
    create_hdf5_dataset,
    load_annotations,
    load_class_map,
    multi_hot,
    uniform_indices,
)
from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
from vimoclip_tpu.ops.preprocess import clip_preprocess

CFG = ClipVisionConfig(
    image_size=32, patch_size=8, hidden_size=32, num_layers=1,
    num_heads=2, intermediate_size=64, projection_dim=16,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("videos")
    rng = np.random.default_rng(0)
    lengths = {"v0.mp4": 5, "v1.mp4": 9, "v2.mp4": 3, "v3.mp4": 12}
    for vid, t in lengths.items():
        write_video(str(root / vid), rng.integers(0, 256, (t, 36, 64, 3), dtype=np.uint8))
    ann = root / "train.txt"
    ann.write_text("v0.mp4 0 2\nv1.mp4 1\nv2.mp4 3\nv3.mp4 0 1 3\nmissing.mp4 2\n")
    cls = root / "classes.csv"
    cls.write_text("id,name\n0,eat\n1,swim\n2,fly\n3,run\n")
    return str(root), lengths


@pytest.fixture(scope="module")
def params():
    return ClipVisionEncoder(CFG).init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32)
    )["params"]


def test_annotation_and_class_parsing(corpus):
    root, _ = corpus
    ann = load_annotations(os.path.join(root, "train.txt"))
    assert ann[0] == ("v0.mp4", [0, 2])
    assert len(ann) == 5
    cmap = load_class_map(os.path.join(root, "classes.csv"))
    assert cmap == {0: "eat", 1: "swim", 2: "fly", 3: "run"}
    np.testing.assert_array_equal(multi_hot([0, 2], 4), [1, 0, 1, 0])


def test_uniform_indices_reference_semantics():
    np.testing.assert_array_equal(uniform_indices(10, None), np.arange(10))
    np.testing.assert_array_equal(uniform_indices(5, 10), np.arange(5))
    # T=10, max=3: step=3 -> [0,3,6,9][:3] = [0,3,6]
    np.testing.assert_array_equal(uniform_indices(10, 3), [0, 3, 6])


def test_extractor_matches_sequential(corpus, params):
    root, lengths = corpus
    videos = [(vid, os.path.join(root, vid)) for vid in lengths]
    # batch smaller than some videos -> forces cross-video packing
    extractor = ClipExtractor(params, CFG, batch_size=4, half_precision=False,
                              decode_workers=2)
    got = {}
    errors = extractor.extract(videos, lambda vid, emb: got.__setitem__(vid, emb))
    assert errors == {}
    assert set(got) == set(lengths)

    enc = ClipVisionEncoder(CFG)
    for vid, t in lengths.items():
        frames = read_video(os.path.join(root, vid))
        ref = np.asarray(
            enc.apply({"params": params}, clip_preprocess(jnp.asarray(frames), 32))
        )
        assert got[vid].shape == (t, 16)
        np.testing.assert_allclose(got[vid], ref, rtol=1e-4, atol=1e-5)


def test_extractor_error_tolerance(corpus, params, tmp_path):
    root, lengths = corpus
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"not a video")
    videos = [("v0.mp4", os.path.join(root, "v0.mp4")), ("bad.mp4", str(bad))]
    extractor = ClipExtractor(params, CFG, batch_size=4, half_precision=False)
    got = {}
    errors = extractor.extract(videos, lambda vid, emb: got.__setitem__(vid, emb))
    assert "bad.mp4" in errors
    assert set(got) == {"v0.mp4"}


def test_create_hdf5_dataset_reference_layout(corpus, params, tmp_path):
    root, lengths = corpus
    out = str(tmp_path / "train_clip_embeddings.h5")
    errors = create_hdf5_dataset(
        data_root=root,
        annotation_file=os.path.join(root, "train.txt"),
        class_file=os.path.join(root, "classes.csv"),
        output_hdf5=out,
        params=params,
        config=CFG,
        batch_size=4,
        split="train",
    )
    assert errors == {"missing.mp4": "not found"}
    with h5py.File(out, "r") as f:
        assert f.attrs["num_classes"] == 4
        assert f.attrs["type"] == "train"
        assert set(k for k in f if isinstance(f[k], h5py.Group)) == set(lengths)
        g = f["v3.mp4"]
        assert g["embeddings"].shape == (12, 16)
        np.testing.assert_array_equal(g["labels"][:], [1, 1, 0, 1])
        assert g.attrs["total_frames"] == 12
        assert "video_ids" in f


def test_create_hdf5_dataset_max_frames(corpus, params, tmp_path):
    root, lengths = corpus
    out = str(tmp_path / "sub.h5")
    create_hdf5_dataset(
        data_root=root,
        annotation_file=os.path.join(root, "train.txt"),
        class_file=os.path.join(root, "classes.csv"),
        output_hdf5=out,
        params=params,
        config=CFG,
        batch_size=4,
        max_frames=4,
    )
    with h5py.File(out, "r") as f:
        # v3 has 12 frames -> step=3 -> indices [0,3,6,9]
        assert f["v3.mp4"]["embeddings"].shape == (4, 16)
        assert f["v0.mp4"]["embeddings"].shape == (4, 16)  # 5 frames, step=1


def test_extract_embeddings_cli_main(corpus, tmp_path):
    """Drive the CLI main() in-process (CPU): torch checkpoint loading,
    config inference, full pipeline, reference layout."""
    import torch
    from transformers import CLIPVisionConfig as HFConfig
    from transformers import CLIPVisionModelWithProjection

    from vimoclip_tpu.cli.extract_embeddings import main

    root, lengths = corpus
    torch.manual_seed(1)
    hf = CLIPVisionModelWithProjection(HFConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=1,
        num_attention_heads=4, image_size=32, patch_size=8, projection_dim=16))
    ckpt = str(tmp_path / "clip.pt")
    torch.save(hf.state_dict(), ckpt)
    out = str(tmp_path / "out.h5")
    main([
        "--data-root", root,
        "--annotation-file", os.path.join(root, "train.txt"),
        "--class-file", os.path.join(root, "classes.csv"),
        "--output", out, "--clip-weights", ckpt,
        "--batch-size", "8", "--split", "train", "--float32",
    ])
    with h5py.File(out, "r") as f:
        assert f.attrs["num_classes"] == 4
        groups = [k for k in f if isinstance(f[k], h5py.Group)]
        assert len(groups) == 4
        assert f["v0.mp4"]["embeddings"].shape == (5, 16)


def test_extractor_mixed_resolutions(tmp_path, params):
    """Mixed-resolution corpus: frames are preprocessed at NATIVE size per
    video (the reference's semantics), each resolution getting its own
    compiled program — embeddings must match per-video direct forwards."""
    rng = np.random.default_rng(4)
    sizes = {"a.mp4": (36, 64), "b.mp4": (48, 40), "c.mp4": (36, 64)}
    videos = []
    for vid, (hgt, wid) in sizes.items():
        path = str(tmp_path / vid)
        write_video(path, rng.integers(0, 256, (6, hgt, wid, 3), dtype=np.uint8))
        videos.append((vid, path))
    extractor = ClipExtractor(params, CFG, batch_size=4, half_precision=False,
                              decode_workers=2)
    got = {}
    errors = extractor.extract(videos, lambda vid, emb: got.__setitem__(vid, emb))
    assert errors == {}
    enc = ClipVisionEncoder(CFG)
    for vid, path in videos:
        frames = read_video(path)
        ref = np.asarray(
            enc.apply({"params": params}, clip_preprocess(jnp.asarray(frames), 32))
        )
        np.testing.assert_allclose(got[vid], ref, rtol=1e-4, atol=1e-5)


def test_extractor_temporal_dedup(tmp_path, params):
    """Opt-in near-duplicate gating: repeated frames reuse the previous
    embedding (fewer ViT forwards), and the output still has one embedding
    per input frame with exact equality for true duplicates."""
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (36, 64, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (36, 64, 3), dtype=np.uint8)
    frames = np.stack([a, a, a, b, b, a])  # 3 unique transitions
    path = str(tmp_path / "dup.mp4")
    write_video(path, frames)
    decoded = read_video(path)  # codec-lossy; duplicates stay near-identical

    calls = []
    extractor = ClipExtractor(params, CFG, batch_size=4, half_precision=False,
                              decode_workers=1, dedup_threshold=2.0)
    orig_embed = extractor._embed

    def counting_embed(p, x):
        calls.append(int(x.shape[0]))
        return orig_embed(p, x)

    extractor._embed = counting_embed
    got = {}
    errors = extractor.extract([("dup.mp4", path)],
                               lambda vid, emb: got.__setitem__(vid, emb))
    assert errors == {}
    emb = got["dup.mp4"]
    assert emb.shape == (6, 16)  # one embedding per input frame
    # duplicates of frame 0 share its embedding exactly
    np.testing.assert_array_equal(emb[0], emb[1])
    np.testing.assert_array_equal(emb[0], emb[2])
    np.testing.assert_array_equal(emb[3], emb[4])
    # and distinct content got distinct embeddings
    assert not np.allclose(emb[0], emb[3])

    # without dedup, all 6 frames are embedded; with it, at most 4 kept
    extractor2 = ClipExtractor(params, CFG, batch_size=4, half_precision=False,
                               decode_workers=1)
    got2 = {}
    extractor2.extract([("dup.mp4", path)],
                       lambda vid, emb: got2.__setitem__(vid, emb))
    # dedup embeddings match the full run at the kept positions
    np.testing.assert_allclose(emb[0], got2["dup.mp4"][0], rtol=1e-4, atol=1e-5)


def test_extractor_streaming_chunks(corpus, params):
    """Streaming: chunks arrive in frame order, each bounded by
    stream_rows + batch, remainder flushed at finish with done(vid, None) —
    host RAM stays O(stream_rows) per video like the reference MN
    extractor's resizable appends (extract_embeddings_mammalNet.py:114-141)."""
    root, lengths = corpus
    videos = [(vid, os.path.join(root, vid)) for vid in lengths]
    batch, stream_rows = 4, 4
    extractor = ClipExtractor(params, CFG, batch_size=batch,
                              half_precision=False, decode_workers=2)
    chunks: dict[str, list] = {}
    finals: dict[str, object] = {}
    errors = extractor.extract(
        videos, lambda vid, emb: finals.__setitem__(vid, emb),
        on_video_chunk=lambda vid, c: chunks.setdefault(vid, []).append(c),
        stream_rows=stream_rows,
    )
    assert errors == {}
    assert set(finals) == set(lengths)

    enc = ClipVisionEncoder(CFG)
    for vid, t in lengths.items():
        parts = chunks.get(vid, [])
        for c in parts[:-1] if parts else []:
            assert len(c) < stream_rows + batch
        if finals[vid] is None:  # streamed video: concatenation is complete
            got = np.concatenate(parts)
            assert t >= stream_rows  # only long videos stream
        else:  # short video: whole-video path, zero chunks
            assert parts == []
            got = finals[vid]
        frames = read_video(os.path.join(root, vid))
        ref = np.asarray(
            enc.apply({"params": params}, clip_preprocess(jnp.asarray(frames), 32))
        )
        assert got.shape == (t, 16)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_create_hdf5_dataset_streaming_matches_whole(corpus, params, tmp_path):
    """stream_rows small enough to force streaming writes must produce a
    file equivalent to the whole-video path (embeddings, labels, attrs,
    video_ids)."""
    root, lengths = corpus
    common = dict(
        data_root=root,
        annotation_file=os.path.join(root, "train.txt"),
        class_file=os.path.join(root, "classes.csv"),
        params=params, config=CFG, batch_size=4, split="train",
    )
    whole, streamed = str(tmp_path / "w.h5"), str(tmp_path / "s.h5")
    create_hdf5_dataset(output_hdf5=whole, **common)  # default stream_rows=2048
    create_hdf5_dataset(output_hdf5=streamed, stream_rows=4, **common)
    with h5py.File(whole, "r") as fw, h5py.File(streamed, "r") as fs:
        assert list(fw["video_ids"].asstr()[:]) == list(fs["video_ids"].asstr()[:])
        # AK semantics: every annotated id, including the missing one
        assert "missing.mp4" in list(fs["video_ids"].asstr()[:])
        for vid in lengths:
            np.testing.assert_allclose(
                fs[vid]["embeddings"][:], fw[vid]["embeddings"][:],
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_array_equal(fs[vid]["labels"][:], fw[vid]["labels"][:])
            assert fs[vid].attrs["total_frames"] == fw[vid].attrs["total_frames"]
            assert fs[vid].attrs["original_frames"] == fw[vid].attrs["original_frames"]


def test_streaming_abort_rolls_back_partial_video(corpus, params, tmp_path,
                                                  monkeypatch):
    """A video that errors mid-decode AFTER streaming chunks out must leave
    no group in the file (reference skips failed videos entirely,
    extract_embeddings.py:113-115) and no leaked host state."""
    import vimoclip_tpu.extraction as ex

    root, lengths = corpus
    real_iter = ex.iter_video_chunks

    def flaky_iter(path, chunk_size):
        if "v3" in path:  # 12 frames: yield most, then blow up
            it = real_iter(path, chunk_size=4)
            yield next(it)
            yield next(it)
            raise IOError("synthetic mid-decode failure")
        yield from real_iter(path, chunk_size=chunk_size)

    monkeypatch.setattr(ex, "iter_video_chunks", flaky_iter)
    out = str(tmp_path / "abort.h5")
    errors = create_hdf5_dataset(
        data_root=root,
        annotation_file=os.path.join(root, "train.txt"),
        class_file=os.path.join(root, "classes.csv"),
        output_hdf5=out, params=params, config=CFG,
        batch_size=4, split="train", stream_rows=4,
    )
    assert "v3.mp4" in errors
    with h5py.File(out, "r") as f:
        groups = {k for k in f if isinstance(f[k], h5py.Group)}
        assert "v3.mp4" not in groups
        assert groups == {"v0.mp4", "v1.mp4", "v2.mp4"}
        # index still lists every annotated id (reference :118-119)
        assert "v3.mp4" in list(f["video_ids"].asstr()[:])


def test_max_frames_respected_when_container_underreports(corpus, params,
                                                          tmp_path, monkeypatch):
    """CAP_PROP_FRAME_COUNT is metadata, not truth: a video whose container
    claims total <= max_frames but decodes more must still be capped by the
    post-hoc subsampling guard — i.e. it must NOT take the streaming path
    (which finalizes without subsampling)."""
    import vimoclip_tpu.data.video_reader as vr
    import vimoclip_tpu.extraction as ex

    root, lengths = corpus
    real_count = vr.video_frame_count

    def lying_count(path):
        if "v3" in path:  # actually 12 frames
            return 3
        return real_count(path)

    monkeypatch.setattr(vr, "video_frame_count", lying_count)
    out = str(tmp_path / "lied.h5")
    create_hdf5_dataset(
        data_root=root,
        annotation_file=os.path.join(root, "train.txt"),
        class_file=os.path.join(root, "classes.csv"),
        output_hdf5=out, params=params, config=CFG,
        batch_size=4, max_frames=4, stream_rows=2,
    )
    with h5py.File(out, "r") as f:
        assert f["v3.mp4"]["embeddings"].shape[0] == 4  # capped post-hoc
        assert f["v3.mp4"].attrs["total_frames"] == 4


def test_extractor_mesh_sharded_matches_sequential(corpus, params):
    """A mesh-backed extractor shards each packed frame batch over the data
    axis (params replicated); embeddings must equal the single-device run."""
    import pytest

    from vimoclip_tpu.parallel import MeshConfig, create_mesh

    root, lengths = corpus
    videos = [(vid, os.path.join(root, vid)) for vid in lengths]
    mesh = create_mesh(MeshConfig(8, 1))
    sharded = ClipExtractor(params, CFG, batch_size=8, half_precision=False,
                            decode_workers=2, mesh=mesh)
    plain = ClipExtractor(params, CFG, batch_size=8, half_precision=False,
                          decode_workers=2)
    got_s, got_p = {}, {}
    assert sharded.extract(videos, lambda v, e: got_s.__setitem__(v, e)) == {}
    assert plain.extract(videos, lambda v, e: got_p.__setitem__(v, e)) == {}
    for vid in lengths:
        np.testing.assert_allclose(got_s[vid], got_p[vid], rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError, match="divisible"):
        ClipExtractor(params, CFG, batch_size=6, mesh=mesh)


def test_cli_float32_flag_controls_dtype(corpus, params, tmp_path, monkeypatch):
    """--float32 must actually reach the extractor (it was parsed but
    dropped before round 2 — the reference's ignored-YAML-lr trap)."""
    import vimoclip_tpu.extraction as ex

    seen = {}
    real = ex.ClipExtractor

    class Spy(real):
        def __init__(self, *a, **kw):
            seen["half_precision"] = kw.get("half_precision")
            super().__init__(*a, **kw)

    monkeypatch.setattr(ex, "ClipExtractor", Spy)
    root, _ = corpus
    ex.create_hdf5_dataset(
        data_root=root,
        annotation_file=os.path.join(root, "train.txt"),
        class_file=os.path.join(root, "classes.csv"),
        output_hdf5=str(tmp_path / "f32.h5"), params=params, config=CFG,
        batch_size=4, half_precision=False,
    )
    assert seen["half_precision"] is False


def test_sharded_extraction_and_merge(corpus, params, tmp_path):
    """--num-shards extraction over a strided annotation split, merged with
    h5_merge, must equal the unsharded file (groups, embeddings, labels,
    attrs, video_ids coverage)."""
    from vimoclip_tpu.cli.h5_merge import main as merge_main, merge

    root, lengths = corpus
    common = dict(
        data_root=root,
        annotation_file=os.path.join(root, "train.txt"),
        class_file=os.path.join(root, "classes.csv"),
        params=params, config=CFG, batch_size=4, split="train",
    )
    whole = str(tmp_path / "whole.h5")
    create_hdf5_dataset(output_hdf5=whole, **common)
    shard_paths = []
    for i in range(2):
        sp = str(tmp_path / f"shard{i}.h5")
        create_hdf5_dataset(output_hdf5=sp, num_shards=2, shard_index=i,
                            **common)
        shard_paths.append(sp)
    merged = str(tmp_path / "merged.h5")
    assert merge_main(shard_paths + ["--output", merged]) == 0

    with h5py.File(whole, "r") as fw, h5py.File(merged, "r") as fm:
        gw = {k for k in fw if isinstance(fw[k], h5py.Group)}
        gm = {k for k in fm if isinstance(fm[k], h5py.Group)}
        assert gw == gm
        assert fm.attrs["num_classes"] == fw.attrs["num_classes"]
        for vid in gw:
            np.testing.assert_allclose(fm[vid]["embeddings"][:],
                                       fw[vid]["embeddings"][:],
                                       rtol=1e-5, atol=1e-6)
            assert fm[vid].attrs["total_frames"] == fw[vid].attrs["total_frames"]
        # index matches the unsharded run EXACTLY, including order — the
        # strided split is undone by round-robin interleave at merge
        assert list(fm["video_ids"].asstr()[:]) == \
            list(fw["video_ids"].asstr()[:])

    # overlapping shards are rejected
    import pytest
    with pytest.raises(ValueError, match="duplicate"):
        merge([shard_paths[0], shard_paths[0]], str(tmp_path / "dup.h5"))

    # shard_index validation
    with pytest.raises(ValueError, match="shard_index"):
        create_hdf5_dataset(output_hdf5=str(tmp_path / "bad.h5"),
                            num_shards=2, shard_index=2, **common)


def test_merge_with_empty_shard_preserves_order(corpus, params, tmp_path):
    """num_shards > annotation count leaves trailing shards with no videos
    (and no video_ids dataset at all). An empty shard must still occupy its
    round-robin slot in the merged index, or every id after the gap shifts."""
    from vimoclip_tpu.cli.h5_merge import merge

    root, _ = corpus
    common = dict(
        data_root=root,
        annotation_file=os.path.join(root, "train.txt"),
        class_file=os.path.join(root, "classes.csv"),
        params=params, config=CFG, batch_size=4, split="train",
    )
    whole = str(tmp_path / "whole.h5")
    create_hdf5_dataset(output_hdf5=whole, **common)
    n_shards = 6  # corpus has 5 annotation lines -> shard 5 is empty
    shard_paths = []
    for i in range(n_shards):
        sp = str(tmp_path / f"shard{i}.h5")
        create_hdf5_dataset(output_hdf5=sp, num_shards=n_shards,
                            shard_index=i, **common)
        shard_paths.append(sp)
    with h5py.File(shard_paths[-1], "r") as f:
        assert "video_ids" not in f  # precondition: genuinely empty shard
    merged = str(tmp_path / "merged_gap.h5")
    merge(shard_paths, merged)
    with h5py.File(whole, "r") as fw, h5py.File(merged, "r") as fm:
        assert list(fm["video_ids"].asstr()[:]) == \
            list(fw["video_ids"].asstr()[:])


def test_load_class_names_headered_and_headerless(tmp_path):
    """The reference reads class_names_dir with header=None
    (train_and_eval.py:183) even though ak_action.csv has a header;
    load_class_names parses both layouts to the same mapping."""
    from vimoclip_tpu.extraction import load_class_names

    headered = tmp_path / "a.csv"
    headered.write_text("id,name\n0,eat\n1,swim\n")
    headerless = tmp_path / "b.csv"
    headerless.write_text("0,eat\n1,swim\n")
    expect = {0: "eat", 1: "swim"}
    assert load_class_names(str(headered)) == expect
    assert load_class_names(str(headerless)) == expect

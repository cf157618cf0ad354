"""C++ libav data-plane tests (skipped when native/libvimo_dataplane.so
hasn't been built — `make -C native`)."""

import os

import cv2
import numpy as np
import pytest

from vimoclip_tpu.data import native
from vimoclip_tpu.data.video_reader import write_video

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native data plane not built (make -C native)"
)


@pytest.fixture(scope="module")
def video(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    rng = np.random.default_rng(0)
    frames = np.stack(
        [cv2.resize(rng.integers(0, 256, (9, 16, 3)).astype(np.uint8), (64, 36))
         for _ in range(20)]
    )
    path = str(d / "t.mp4")
    write_video(path, frames)
    # decode ground truth from the SAME encoded file via OpenCV
    cap = cv2.VideoCapture(path)
    ref = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        ref.append(cv2.cvtColor(f, cv2.COLOR_BGR2RGB))
    cap.release()
    return path, np.stack(ref)


def test_whole_video_bit_exact(video):
    path, ref = video
    got = native.read_video(path)
    np.testing.assert_array_equal(got, ref)


def test_window_seek_bit_exact(video):
    path, ref = video
    got = native.read_video_window(path, 7, 5)
    np.testing.assert_array_equal(got, ref[7:12])
    # window straddling EOF clamps
    tail = native.read_video_window(path, 18, 5)
    np.testing.assert_array_equal(tail, ref[18:])


def test_sequential_windows_single_decoder(video):
    path, ref = video
    d = native._Decoder(path)
    try:
        a = d.read_window(0, 4)
        b = d.read_window(4, 4)  # continues linearly, no seek
        c = d.read_window(2, 3)  # backward seek
        np.testing.assert_array_equal(a, ref[0:4])
        np.testing.assert_array_equal(b, ref[4:8])
        np.testing.assert_array_equal(c, ref[2:5])
    finally:
        d.close()


def test_open_failure_and_bad_file(tmp_path):
    with pytest.raises(IOError):
        native.read_video(str(tmp_path / "missing.mp4"))
    bad = tmp_path / "bad.mp4"
    bad.write_bytes(b"garbage" * 100)
    with pytest.raises(IOError):
        native.read_video(str(bad))


def test_video_reader_native_opt_in(video, monkeypatch):
    from vimoclip_tpu.data import video_reader

    path, ref = video
    monkeypatch.setenv("VIMO_NATIVE_DECODE", "1")
    got = video_reader.read_video(path)
    np.testing.assert_array_equal(got, ref)
    got_w = video_reader.read_video_window(path, 3, 4)
    np.testing.assert_array_equal(got_w, ref[3:7])
    monkeypatch.setenv("VIMO_NATIVE_DECODE", "0")
    np.testing.assert_array_equal(video_reader.read_video(path), ref)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("pool_corpus")
    rng = np.random.default_rng(3)
    paths, refs = {}, {}
    for name, t in [("a", 11), ("b", 5), ("c", 23)]:
        frames = np.stack(
            [cv2.resize(rng.integers(0, 256, (9, 16, 3)).astype(np.uint8),
                        (64, 36)) for _ in range(t)]
        )
        p = str(d / f"{name}.mp4")
        write_video(p, frames)
        refs[name] = native.read_video(p)  # per-video decoder = ground truth
        paths[name] = p
    bad = str(d / "bad.mp4")
    open(bad, "wb").write(b"not a video")
    paths["bad"] = bad
    return paths, refs


def test_decode_pool_matches_per_video_decoder(corpus):
    """The C++ corpus pool must deliver, per video: in-order frame blocks
    whose concatenation equals the single-decoder output, exactly one final
    block, and error reporting for broken files."""
    paths, refs = corpus
    got: dict[str, list] = {}
    finals: dict[str, int] = {}
    errors: dict[str, str] = {}
    with native.DecodePool(workers=3, chunk_frames=8, max_ready=4) as pool:
        for vid, p in paths.items():
            pool.submit(vid, p)
        pool.seal()
        for vid, frames, final, error in pool:
            if error is not None:
                errors[vid] = error
            if frames.size:
                got.setdefault(vid, []).append(frames)
            if final:
                finals[vid] = finals.get(vid, 0) + 1
    assert set(errors) == {"bad"}
    assert finals == {"a": 1, "b": 1, "c": 1, "bad": 1}
    for vid, ref in refs.items():
        np.testing.assert_array_equal(np.concatenate(got[vid]), ref)


def test_decode_pool_submit_after_seal_rejected(corpus):
    paths, _ = corpus
    with native.DecodePool(workers=1) as pool:
        pool.seal()
        with pytest.raises(RuntimeError):
            pool.submit("x", paths["a"])
        assert list(pool) == []  # drained immediately


def test_extractor_uses_native_pool(corpus, monkeypatch):
    """End-to-end: VIMO_NATIVE_DECODE=1 routes extraction through the C++
    pool and produces the same embeddings as the Python-thread backend."""
    import jax
    import jax.numpy as jnp

    from vimoclip_tpu.extraction import ClipExtractor
    from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder

    cfg = ClipVisionConfig(image_size=32, patch_size=8, hidden_size=32,
                           num_layers=1, num_heads=2, intermediate_size=64,
                           projection_dim=16)
    params = ClipVisionEncoder(cfg).init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32))["params"]
    paths, refs = corpus
    videos = [(vid, p) for vid, p in paths.items()]

    monkeypatch.delenv("VIMO_NATIVE_DECODE", raising=False)
    plain = {}
    ClipExtractor(params, cfg, batch_size=8, half_precision=False).extract(
        videos, lambda v, e: plain.__setitem__(v, e))

    monkeypatch.setenv("VIMO_NATIVE_DECODE", "1")
    pooled = {}
    errs = ClipExtractor(params, cfg, batch_size=8, half_precision=False,
                         decode_workers=3).extract(
        videos, lambda v, e: pooled.__setitem__(v, e))
    assert "bad" in errs
    assert set(pooled) == set(plain) == set(refs)
    for vid in refs:
        np.testing.assert_allclose(pooled[vid], plain[vid],
                                   rtol=1e-5, atol=1e-6)


def test_pool_tsan_binary_clean(corpus, tmp_path):
    """Run the thread-sanitized pool driver (make -C native tsan-test) over
    the corpus; any data race fails the run. Skipped if not built."""
    import subprocess

    binary = os.path.join(os.path.dirname(__file__), "..", "native",
                          "pool_test_tsan")
    if not os.path.exists(binary):
        pytest.skip("pool_test_tsan not built (make -C native tsan-test)")
    paths, _ = corpus
    vids = [p for vid, p in paths.items() if vid != "bad"]
    proc = subprocess.run([binary] + vids, capture_output=True, text=True,
                          timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "pool_test OK" in proc.stdout
    assert "ThreadSanitizer" not in proc.stderr

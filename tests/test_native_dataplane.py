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

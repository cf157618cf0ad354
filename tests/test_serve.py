"""vimo-serve daemon tests: both frontends answer with vimo-predict's
record shape over the same fused predictor, survive bad requests, and the
HTTP batch route matches the library's pooled predict_batch."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vimoclip_tpu.cli.serve import (
    handle_request,
    make_http_server,
    prediction_record,
    serve_stdin,
)
from vimoclip_tpu.config import TFAMModelConfig
from vimoclip_tpu.data.video_reader import write_video
from vimoclip_tpu.models import TFAM
from vimoclip_tpu.models.clip_vit import ClipVisionConfig, ClipVisionEncoder
from vimoclip_tpu.serving import ViMoCLIPPredictor

VCFG = ClipVisionConfig(
    image_size=32, patch_size=8, hidden_size=32, num_layers=1,
    num_heads=2, intermediate_size=64, projection_dim=16,
)
TCFG = TFAMModelConfig(d_model=16, nhead=2, num_layers=1, dim_feedforward=32,
                       dropout=0.0, mlp_dropout=0.0, attention_impl="xla")
C = 7


@pytest.fixture(scope="module")
def predictor():
    enc = ClipVisionEncoder(VCFG)
    tp = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    sp = enc.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))["params"]
    tfam = TFAM(config=TCFG, num_classes=C)
    fp = tfam.init(
        jax.random.key(2), jnp.zeros((1, 4, 16)), jnp.zeros((1, 3, 16)),
        jnp.ones((1, 4), bool), jnp.ones((1, 3), bool),
    )["params"]
    return ViMoCLIPPredictor(
        teacher_params=tp, teacher_config=VCFG,
        student_params=sp, student_config=VCFG,
        tfam_params=fp, tfam_config=TCFG, num_classes=C,
        class_names={0: "eat", 1: "swim"},
        frame_batch=8, length_bucket=8, half_precision=False,
    )


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_daemon")
    rng = np.random.default_rng(0)
    paths = []
    for i, t in enumerate((11, 9)):
        p = str(d / f"clip{i}.mp4")
        write_video(p, rng.integers(0, 256, (t, 36, 48, 3), dtype=np.uint8))
        paths.append(p)
    return paths


def test_stdin_loop_single_and_batch(predictor, videos):
    reqs = [
        {"video": videos[0], "top_k": 3},
        {"videos": videos, "top_k": 2},
        {"video": "/nonexistent.mp4"},  # must NOT kill the loop
        {"video": videos[1]},
    ]
    out = io.StringIO()
    n = serve_stdin(
        predictor, io.StringIO("\n".join(json.dumps(r) for r in reqs)), out
    )
    assert n == 4
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(lines) == 4

    expect0 = prediction_record(
        videos[0], predictor.predict(videos[0], top_k=3)
    )
    assert lines[0] == expect0
    assert [r["video"] for r in lines[1]["results"]] == videos
    assert all(len(r["predictions"]) == 2 for r in lines[1]["results"])
    assert "error" in lines[2]
    assert len(lines[3]["predictions"]) == 5  # default top_k


def test_batch_route_matches_library_predict_batch(predictor, videos):
    resp = handle_request(predictor, {"videos": videos, "top_k": 4})
    direct = predictor.predict_batch(videos, top_k=4)
    assert resp["results"] == [
        prediction_record(v, p) for v, p in zip(videos, direct)
    ]


def test_http_server(predictor, videos):
    server = make_http_server(predictor, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert r.status == 200
            assert json.load(r) == {"status": "ok"}

        body = json.dumps({"videos": videos, "top_k": 3}).encode()
        req = urllib.request.Request(
            f"{base}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            resp = json.load(r)
        direct = predictor.predict_batch(videos, top_k=3)
        assert resp["results"] == [
            prediction_record(v, p) for v, p in zip(videos, direct)
        ]

        bad = urllib.request.Request(
            f"{base}/predict", data=json.dumps({"video": "/missing.mp4"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(bad, timeout=60)
        assert exc.value.code == 400
        assert "error" in json.load(exc.value)
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)


def test_motion_video_request(predictor, videos, tmp_path):
    """A request carrying an explicit motion video routes through the
    precomputed-motion path (predictor.predict(motion_video_path=...))."""
    rng = np.random.default_rng(1)
    motion = str(tmp_path / "motion.mp4")
    write_video(motion, rng.integers(0, 256, (10, 36, 48, 3), dtype=np.uint8))
    resp = handle_request(
        predictor, {"video": videos[0], "motion_video": motion, "top_k": 3}
    )
    direct = predictor.predict(videos[0], motion_video_path=motion, top_k=3)
    assert resp == prediction_record(videos[0], direct)


def test_batch_route_partial_motion_dict_falls_back_to_dir(
    predictor, videos, tmp_path
):
    """A partial motion_videos dict must not disable the --motion-videos-dir
    fallback for the videos it omits — each video resolves like the
    single-video route (explicit entry wins, then dir match)."""
    import os

    rng = np.random.default_rng(2)
    mdir = tmp_path / "motions"
    mdir.mkdir()
    explicit = str(tmp_path / "explicit.mp4")
    write_video(explicit, rng.integers(0, 256, (10, 36, 48, 3), dtype=np.uint8))
    stem1 = os.path.splitext(os.path.basename(videos[1]))[0]
    dir_match = str(mdir / f"{stem1}.mp4")
    write_video(dir_match, rng.integers(0, 256, (8, 36, 48, 3), dtype=np.uint8))

    resp = handle_request(
        predictor,
        {"videos": videos, "motion_videos": {videos[0]: explicit}, "top_k": 3},
        motion_videos_dir=str(mdir),
    )
    direct = [
        predictor.predict(videos[0], motion_video_path=explicit, top_k=3),
        predictor.predict(videos[1], motion_video_path=dir_match, top_k=3),
    ]
    assert resp["results"] == [
        prediction_record(v, p) for v, p in zip(videos, direct)
    ]


def test_serve_verify_fidelity_requires_probe_video(tmp_path):
    """The daemon has no request video at startup, so --verify-fidelity
    without --probe-video is a usage error, not a silent no-op."""
    from vimoclip_tpu.cli.serve import main

    with pytest.raises(SystemExit):
        main([
            "--teacher-weights", "w.pt", "--student-checkpoint-dir", "d",
            "--tfam-config", "c.yaml", "--tfam-torch-checkpoint", "t.pth",
            "--verify-fidelity", "4",
        ])

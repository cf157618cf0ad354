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
    DynamicBatcher,
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


class _RecordingPredictor:
    """Pass-through proxy that counts device-side calls (coalescing proof)."""

    def __init__(self, inner):
        self.inner = inner
        self.batch_calls: list[list[str]] = []
        self.serial_calls: list[str] = []

    def predict_batch(self, videos, top_k=5, max_frames=None):
        self.batch_calls.append(list(videos))
        return self.inner.predict_batch(videos, top_k=top_k,
                                        max_frames=max_frames)

    def predict(self, video, motion_video_path=None, top_k=5,
                max_frames=None):
        self.serial_calls.append(video)
        return self.inner.predict(video, motion_video_path=motion_video_path,
                                  top_k=top_k, max_frames=max_frames)


def _submit_concurrently(batcher, requests):
    """Run predict_many for each request on its own thread (the HTTP
    handler-thread shape); returns results/errors in request order."""
    out = [None] * len(requests)
    barrier = threading.Barrier(len(requests))

    def run(i, req):
        barrier.wait()
        try:
            out[i] = ("ok", batcher.predict_many(*req))
        except Exception as e:  # noqa: BLE001 — asserted by callers
            out[i] = ("err", e)

    threads = [threading.Thread(target=run, args=(i, r))
               for i, r in enumerate(requests)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(o is not None for o in out), "a submitter thread hung"
    return out


def test_dynamic_batcher_coalesces_concurrent_requests(predictor, videos):
    """Two concurrent single-video requests share ONE pooled device call,
    and each response is bit-identical to a solo predict — including
    per-request top_k (sliced from the group-max pooled call)."""
    rec = _RecordingPredictor(predictor)
    batcher = DynamicBatcher(rec, max_batch=2, max_wait_ms=5000)
    try:
        out = _submit_concurrently(batcher, [
            ([videos[0]], [None], 3, None),
            ([videos[1]], [None], 2, None),
        ])
    finally:
        batcher.shutdown()
    assert [s for s, _ in out] == ["ok", "ok"]
    # one pooled call served both requests
    assert len(rec.batch_calls) == 1 and len(rec.serial_calls) == 0
    assert sorted(rec.batch_calls[0]) == sorted(videos)
    stats = batcher.stats()
    assert stats["requests"] == 2
    assert stats["predictor_calls"] == 1
    assert stats["max_coalesced"] == 2
    # numerics + per-request top_k match the solo path exactly
    for (state, preds), video, k in zip(out, videos, (3, 2)):
        solo = predictor.predict(video, top_k=k)
        assert prediction_record(video, preds[0]) == \
            prediction_record(video, solo)
        assert len(preds[0].top_classes) == k


def test_dynamic_batcher_isolates_bad_video(predictor, videos):
    """A pooled group containing an unreadable path retries serially: the
    bad REQUEST fails, its co-batched neighbour from another request
    succeeds with solo-identical output."""
    rec = _RecordingPredictor(predictor)
    batcher = DynamicBatcher(rec, max_batch=2, max_wait_ms=5000)
    try:
        out = _submit_concurrently(batcher, [
            ([videos[0]], [None], 3, None),
            (["/nonexistent.mp4"], [None], 3, None),
        ])
    finally:
        batcher.shutdown()
    states = {s for s, _ in out}
    assert states == {"ok", "err"}
    good = next(v for s, v in out if s == "ok")
    assert prediction_record(videos[0], good[0]) == prediction_record(
        videos[0], predictor.predict(videos[0], top_k=3)
    )
    # the pooled attempt failed and fell back to per-video serial calls
    assert len(rec.serial_calls) == 2


def test_dynamic_batcher_motion_videos_run_serially(predictor, videos,
                                                    tmp_path):
    """Precomputed-motion videos can't share the pooled frame-diff path —
    the batcher must route them through predictor.predict and still match
    the direct call."""
    rng = np.random.default_rng(3)
    motion = str(tmp_path / "m.mp4")
    write_video(motion, rng.integers(0, 256, (10, 36, 48, 3), dtype=np.uint8))
    rec = _RecordingPredictor(predictor)
    batcher = DynamicBatcher(rec, max_batch=4, max_wait_ms=5000)
    try:
        out = _submit_concurrently(batcher, [
            ([videos[0]], [motion], 3, None),
            ([videos[1]], [None], 3, None),
        ])
    finally:
        batcher.shutdown()
    assert [s for s, _ in out] == ["ok", "ok"]
    # the motion video went serial; its neighbour, now a group of one,
    # degrades to a serial call as well (no pooled call of size 1)
    assert sorted(rec.serial_calls) == sorted(videos)
    assert rec.batch_calls == []
    direct = predictor.predict(videos[0], motion_video_path=motion, top_k=3)
    got = next(v for s, v in out if v[0].video_id == videos[0])
    assert prediction_record(videos[0], got[0]) == prediction_record(
        videos[0], direct
    )


class _StubPred:
    """Records predict() kwargs; returns a minimal prediction object."""

    class _P:
        top_classes = [(0, "eat", 0.9)]

    def __init__(self):
        self.calls = []

    def predict(self, video, motion_video_path=None, top_k=5,
                max_frames=None):
        self.calls.append({"video": video, "max_frames": max_frames,
                           "top_k": top_k})
        return self._P()


def test_daemon_max_frames_default_and_override():
    """--max-frames becomes the daemon-level default for requests that omit
    max_frames; an EXPLICIT null in the request means 'no cap' and
    overrides it (previously the flag was parsed and silently ignored)."""
    stub = _StubPred()
    handle_request(stub, {"video": "a.mp4"}, default_max_frames=7)
    handle_request(stub, {"video": "b.mp4", "max_frames": None},
                   default_max_frames=7)
    handle_request(stub, {"video": "c.mp4", "max_frames": 3},
                   default_max_frames=7)
    assert [c["max_frames"] for c in stub.calls] == [7, None, 3]


def test_http_status_codes_distinguish_client_and_server_faults():
    """Malformed/bad-input requests answer 400; server-side faults answer
    500 (so retry policies treat them as transient, not invalid input)."""

    class _Boom:
        def predict(self, *a, **k):
            raise RuntimeError("device fell over")

    server = make_http_server(_Boom(), port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}/predict"

        def post(body: bytes) -> int:
            req = urllib.request.Request(
                url, data=body, headers={"Content-Type": "application/json"}
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status
            except urllib.error.HTTPError as e:
                return e.code

        import urllib.error

        assert post(b"not json at all") == 400
        assert post(b"{}") == 400            # neither "video" nor "videos"
        assert post(json.dumps({"video": "x.mp4"}).encode()) == 500
    finally:
        server.shutdown()
        thread.join(timeout=10)


def test_batcher_rejects_requests_after_shutdown(predictor):
    batcher = DynamicBatcher(predictor, max_batch=2, max_wait_ms=1)
    batcher.shutdown()
    with pytest.raises(RuntimeError, match="shut down"):
        batcher.predict_many(["x.mp4"], [None], 3, None)


def test_dynamic_batcher_zero_wait_pools_within_request(predictor, videos):
    """--batch-wait-ms 0 disables cross-request coalescing ONLY: a single
    multi-video request is one atomic queue entry, so it always runs as one
    pooled device call — and a request bigger than max_batch still pools
    whole (max_batch caps coalescing ACROSS requests, never splits one)."""
    rec = _RecordingPredictor(predictor)
    batcher = DynamicBatcher(rec, max_batch=1, max_wait_ms=0)
    try:
        out = batcher.predict_many(list(videos), [None] * len(videos), 3, None)
    finally:
        batcher.shutdown()
    assert len(rec.batch_calls) == 1 and rec.serial_calls == []
    assert rec.batch_calls[0] == list(videos)
    for video, pred in zip(videos, out):
        solo = predictor.predict(video, top_k=3)
        assert prediction_record(video, pred) == prediction_record(video, solo)


def test_http_server_dynamic_batching_and_stats(predictor, videos):
    """The HTTP frontend with a batcher: concurrent POSTs coalesce (stats
    prove it), responses match the lock-serialised server's, and /stats
    answers on both configurations."""
    rec = _RecordingPredictor(predictor)
    batcher = DynamicBatcher(rec, max_batch=2, max_wait_ms=5000)
    server = make_http_server(rec, port=0, batcher=batcher)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base = f"http://127.0.0.1:{port}"
        results = [None, None]

        def post(i, video, k):
            body = json.dumps({"video": video, "top_k": k}).encode()
            req = urllib.request.Request(
                f"{base}/predict", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.load(r)

        threads = [
            threading.Thread(target=post, args=(i, v, k))
            for i, (v, k) in enumerate(zip(videos, (3, 2)))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        for res, video, k in zip(results, videos, (3, 2)):
            assert res == prediction_record(
                video, predictor.predict(video, top_k=k)
            )
        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.load(r)
        assert stats["requests"] == 2
        # both arrived within the 5s window -> exactly one pooled call
        assert stats["predictor_calls"] == 1 and stats["max_coalesced"] == 2
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)
        batcher.shutdown()

    # no batcher -> /stats reports the feature off
    server = make_http_server(predictor, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            assert json.load(r) == {"dynamic_batching": False}
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)


def test_serve_warmup_requires_probe_video():
    """--warmup compiles on a representative video; without one it's a
    usage error."""
    from vimoclip_tpu.cli.serve import main

    with pytest.raises(SystemExit):
        main([
            "--teacher-weights", "w.pt", "--student-checkpoint-dir", "d",
            "--tfam-config", "c.yaml", "--tfam-torch-checkpoint", "t.pth",
            "--warmup",
        ])


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


# ---------------------------------------------------------------------------
# production hardening (round 5, VERDICT r4 #4 + ADVICE r4): backpressure,
# per-request deadline, deterministic shutdown, graceful SIGTERM drain.
# ---------------------------------------------------------------------------


class _BlockingPred:
    """predict() blocks on ``release`` after signalling ``started`` —
    deterministic in-flight state for backpressure/drain tests."""

    class _P:
        top_classes = [(0, "eat", 0.9)]

    def __init__(self):
        self.started = threading.Event()
        self.release = threading.Event()
        self.calls: list[str] = []

    def predict(self, video, motion_video_path=None, top_k=5,
                max_frames=None):
        self.calls.append(video)
        self.started.set()
        assert self.release.wait(timeout=60), "test forgot to release"
        return self._P()


def test_batcher_backpressure_sheds_load():
    """Once max_pending videos are queued-but-unserved, further requests
    raise Overloaded (the HTTP layer maps it to 503 + Retry-After) instead
    of growing the backlog unboundedly."""
    from vimoclip_tpu.cli.serve import Overloaded

    stub = _BlockingPred()
    batcher = DynamicBatcher(stub, max_batch=1, max_wait_ms=0, max_pending=2)
    try:
        ta = threading.Thread(
            target=lambda: batcher.predict_many(["a.mp4"], [None], 3, None),
            daemon=True,
        )
        ta.start()
        assert stub.started.wait(timeout=30)  # worker is blocked inside a
        tb = threading.Thread(
            target=lambda: batcher.predict_many(["b.mp4"], [None], 3, None),
            daemon=True,
        )
        tb.start()
        # pending reaches max_pending=2 (a still unserved + b queued);
        # wait until b's enqueue is visible before asserting the bound
        deadline = 5.0
        import time as _time
        t0 = _time.monotonic()
        while batcher._pending < 2 and _time.monotonic() - t0 < deadline:
            _time.sleep(0.01)
        assert batcher._pending == 2
        with pytest.raises(Overloaded, match="backlog full"):
            batcher.predict_many(["c.mp4"], [None], 3, None)
        assert batcher.stats()["shed"] == 1
    finally:
        stub.release.set()
        ta.join(timeout=30)
        tb.join(timeout=30)
        batcher.shutdown()
    assert batcher._pending == 0


def test_batcher_request_timeout():
    """A request waiting past the deadline raises RequestTimeout (HTTP
    504); the underlying work still completes device-side."""
    from vimoclip_tpu.cli.serve import RequestTimeout

    stub = _BlockingPred()
    batcher = DynamicBatcher(stub, max_batch=1, max_wait_ms=0,
                             request_timeout_s=0.2)
    try:
        with pytest.raises(RequestTimeout, match="deadline"):
            batcher.predict_many(["a.mp4"], [None], 3, None)
        assert batcher.stats()["timeouts"] == 1
    finally:
        stub.release.set()
        batcher.shutdown()


def test_batcher_shutdown_drains_queued_then_fails_stragglers():
    """Shutdown serves everything already queued (FIFO ahead of the
    sentinel), and entries landing BEHIND the sentinel are failed
    deterministically instead of being left to the 1s liveness poll
    (ADVICE r4 shutdown race)."""
    from vimoclip_tpu.cli.serve import _SHUTDOWN, _PendingVideo

    stub = _BlockingPred()
    batcher = DynamicBatcher(stub, max_batch=1, max_wait_ms=0)
    results = {}

    def submit(name):
        try:
            results[name] = ("ok", batcher.predict_many(
                [f"{name}.mp4"], [None], 3, None))
        except Exception as e:  # noqa: BLE001 — asserted below
            results[name] = ("err", e)

    ta = threading.Thread(target=submit, args=("a",), daemon=True)
    ta.start()
    assert stub.started.wait(timeout=30)      # worker blocked inside a
    tb = threading.Thread(target=submit, args=("b",), daemon=True)
    tb.start()
    while batcher._pending < 2:               # b enqueued behind a
        pass
    # simulate the ADVICE race: an entry that passed the _closed check
    # lands BEHIND the shutdown sentinel
    batcher._q.put(_SHUTDOWN)
    straggler = _PendingVideo("c.mp4", None, 3, None)
    with batcher._pending_lock:
        batcher._pending += 1
    batcher._q.put([straggler])
    stub.release.set()
    ta.join(timeout=30)
    tb.join(timeout=30)
    batcher._worker.join(timeout=30)
    assert results["a"][0] == "ok" and results["b"][0] == "ok"
    assert straggler.done.is_set()
    assert "shut down" in str(straggler.error)
    assert batcher._pending == 0


def test_pooled_short_prediction_list_falls_back_serially():
    """A predictor returning fewer predictions than videos must not leave
    tail items un-done (handler threads would spin forever against an
    alive-but-idle worker, ADVICE r4) — the group retries serially."""

    class _ShortBatchPred(_StubPred):
        def predict_batch(self, videos, top_k=5, max_frames=None):
            return [self._P()] * (len(videos) - 1)  # one short

    stub = _ShortBatchPred()
    batcher = DynamicBatcher(stub, max_batch=4, max_wait_ms=0)
    try:
        out = batcher.predict_many(["a.mp4", "b.mp4"], [None, None], 3, None)
    finally:
        batcher.shutdown()
    assert len(out) == 2
    assert [c["video"] for c in stub.calls] == ["a.mp4", "b.mp4"]


def test_explicit_null_motion_forces_frame_diff(tmp_path):
    """motion_videos: {video: null} forces the on-device frame-diff path
    even when --motion-videos-dir has a filename match — 'present with
    null' differs from 'absent' (ADVICE r4)."""

    class _BatchStub(_StubPred):
        def __init__(self):
            super().__init__()
            self.batch_calls = []
            self.motion_paths = []

        def predict(self, video, motion_video_path=None, top_k=5,
                    max_frames=None):
            self.motion_paths.append(motion_video_path)
            return super().predict(video, top_k=top_k,
                                   max_frames=max_frames)

        def predict_batch(self, videos, top_k=5, max_frames=None):
            self.batch_calls.append(list(videos))
            return [self._P() for _ in videos]

    mdir = tmp_path / "motions"
    mdir.mkdir()
    (mdir / "clip.mp4").touch()  # dir match for clip.mp4
    stub = _BatchStub()
    video = str(tmp_path / "clip.mp4")
    handle_request(
        stub,
        {"videos": [video], "motion_videos": {video: None}},
        motion_videos_dir=str(mdir),
    )
    # an explicit null suppressed the dir match: the pooled (motionless)
    # route ran, not the serial motion-file route
    assert stub.batch_calls == [[video]]
    assert stub.calls == []

    # the single-video route must honor the SAME rule: an explicit null
    # reaches predict() as motion_video_path=None despite the dir match,
    # while omitting the key resolves the dir match
    handle_request(stub, {"video": video, "motion_video": None},
                   motion_videos_dir=str(mdir))
    handle_request(stub, {"video": video}, motion_videos_dir=str(mdir))
    assert stub.motion_paths == [None, str(mdir / "clip.mp4")]


def test_http_503_and_504_statuses():
    """Overload answers 503 with Retry-After; a request past the deadline
    answers 504 — load balancers and clients can react correctly."""
    import urllib.error

    stub = _BlockingPred()
    batcher = DynamicBatcher(stub, max_batch=1, max_wait_ms=0, max_pending=1,
                             request_timeout_s=0.3)
    server = make_http_server(stub, port=0, batcher=batcher)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    def post(payload):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=30) as r:
                return r.status, dict(r.headers)
        except urllib.error.HTTPError as e:
            return e.code, dict(e.headers)

    try:
        # first request occupies the worker AND fills max_pending=1;
        # it will itself 504 after 0.3s (the stub never releases in time)
        t1 = threading.Thread(
            target=lambda: post({"video": "a.mp4"}), daemon=True
        )
        t1.start()
        assert stub.started.wait(timeout=30)
        code, headers = post({"video": "b.mp4"})
        assert code == 503
        assert int(headers.get("Retry-After", 0)) >= 1
        t1.join(timeout=30)
        # now exercise the deadline directly (the worker is still blocked)
        code, _ = post({"video": "c.mp4"})
        assert code in (503, 504)  # 503 if a's video still counts pending
    finally:
        stub.release.set()
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)
        batcher.shutdown()


def test_sigterm_graceful_drain():
    """SIGTERM during an in-flight request: the accept loop stops, the
    in-flight response completes, serve_http returns (process would exit
    0) — VERDICT r4 #4's preemption story."""
    import os
    import signal as _signal
    import urllib.error

    stub = _BlockingPred()
    batcher = DynamicBatcher(stub, max_batch=1, max_wait_ms=0)
    server = make_http_server(stub, port=0, batcher=batcher)
    port = server.server_address[1]
    status = {}

    def client():
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=json.dumps({"video": "a.mp4"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=60) as r:
                status["code"] = r.status
        except urllib.error.HTTPError as e:
            status["code"] = e.code

    tc = threading.Thread(target=client, daemon=True)
    tc.start()

    def signaller():
        assert stub.started.wait(timeout=30)  # request is in flight
        os.kill(os.getpid(), _signal.SIGTERM)
        time_mod.sleep(0.3)
        stub.release.set()                    # let the in-flight finish

    import time as time_mod

    ts = threading.Thread(target=signaller, daemon=True)
    ts.start()
    old = _signal.getsignal(_signal.SIGTERM)
    try:
        from vimoclip_tpu.cli.serve import serve_http

        serve_http(server, batcher)  # returns only after the drain
    finally:
        _signal.signal(_signal.SIGTERM, old)
    tc.join(timeout=30)
    ts.join(timeout=30)
    assert status.get("code") == 200, status
    # post-drain, the socket is closed: new connections are refused
    with pytest.raises((ConnectionRefusedError, urllib.error.URLError, OSError)):
        urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=5
        )


_HARDKILL_WORKER = '''
import os, sys, threading
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from vimoclip_tpu.cli.serve import make_http_server, serve_http


class _Wedged:
    """Predictor that never returns — a tunnel/device hang stand-in."""

    def predict(self, video, motion_video_path=None, top_k=5,
                max_frames=None):
        print("INFLIGHT", flush=True)
        threading.Event().wait()


server = make_http_server(_Wedged(), port=0)
print(f"PORT {server.server_address[1]}", flush=True)
serve_http(server)
print("DRAINED", flush=True)
'''


@pytest.mark.slow
def test_second_sigterm_hard_kills_wedged_drain(tmp_path):
    """docs/SERVING.md's contract: the first SIGTERM drains; a SECOND
    signal hard-kills even when the drain is wedged on a predictor that
    never returns (no --request-timeout-s) — without it, a fleet's
    TERM+grace window ends in an unclean SIGKILL."""
    import signal as _signal
    import subprocess
    import sys
    import time as time_mod
    import urllib.request

    worker = tmp_path / "serve_worker.py"
    worker.write_text(_HARDKILL_WORKER)
    proc = subprocess.Popen(
        [sys.executable, str(worker)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    lines = []
    try:
        port = None
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("PORT "):
                port = int(line.split()[1])
                break
        assert port, "".join(lines)

        def client():
            try:
                urllib.request.urlopen(
                    urllib.request.Request(
                        f"http://127.0.0.1:{port}/predict",
                        data=json.dumps({"video": "a.mp4"}).encode(),
                        headers={"Content-Type": "application/json"},
                    ),
                    timeout=60,
                )
            except Exception:
                pass  # the worker dies mid-response by design

        threading.Thread(target=client, daemon=True).start()
        for line in proc.stdout:
            lines.append(line)
            if line.startswith("INFLIGHT"):
                break

        proc.send_signal(_signal.SIGTERM)   # drain starts, wedges forever
        time_mod.sleep(0.5)
        proc.send_signal(_signal.SIGTERM)   # documented hard-kill
        rc = proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
    out = "".join(lines) + (proc.stdout.read() or "")
    # default-action SIGTERM death, not a completed drain
    assert rc == -_signal.SIGTERM, f"rc={rc}\n{out}"
    assert "DRAINED" not in out

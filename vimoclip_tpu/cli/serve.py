"""Long-running serving daemon: the fused ViMoCLIP cascade behind a JSON
API.

The reference has no serving story at all — a prediction requires manually
chaining three offline stages through HDF5 files (SURVEY.md §1) — and
``vimo-predict`` covers one-shot CLI use, where weight loading + the first
jit compile dominate. This daemon covers deployment: weights load and
programs compile ONCE, then every request reuses them (a new request shape
only recompiles when it lands in a new length bucket, ops/batching).

Two frontends over the same predictor (cli/predict.py's ``build_predictor``
— identical flags, identical numerics):

- default: JSON lines on stdin -> one JSON prediction line per request on
  stdout. Request: ``{"video": "/path.mp4"[, "motion_video": "...",
  "top_k": 5, "max_frames": N]}``. EOF ends the process. This is the
  pipe-friendly form (xargs, a socket wrapper, a job queue worker).
- ``--port N``: a minimal threaded HTTP endpoint.
  ``POST /predict`` with ``{"videos": [paths...][, "top_k", "max_frames"]}``
  answers ``{"results": [...]}`` — multi-video requests share pooled
  embedding batches and ONE fusion call (serving.predict_batch).
  ``GET /healthz`` answers 200 once the models are resident (readiness
  probe); ``GET /stats`` reports request/coalescing counters. The server
  binds 127.0.0.1 by default (put a real ingress in front for anything
  else).

Under HTTP, CONCURRENT requests coalesce: a single worker thread drains a
queue and feeds videos from different in-flight requests through ONE pooled
``predict_batch`` call (``DynamicBatcher`` — cross-request dynamic
batching, the standard production-serving shape). On-chip the pooled path
runs 1.56x the serial loop (bench.py serving section), so under load the
daemon's throughput approaches the pooled rate instead of serialising
device access request-by-request. Masked (batch-invariant) pooling makes
coalesced == solo bit-identical; ``--quirk-batch-pooling`` restores the
reference's batch-max pooling, whose output DEPENDS on co-batched clips, so
that flag disables cross-request coalescing (within-request batching
keeps the quirk semantics the library documents).

Responses use vimo-predict's record shape, so downstream consumers of its
``--output`` JSON parse daemon responses unchanged.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import queue
import signal
import threading
import time

# ONE record-shape definition for both surfaces (daemon responses must
# stay parseable by vimo-predict --output consumers); predict.py's
# module level is import-light, no jax pulled here.
from vimoclip_tpu.cli.predict import prediction_record
from vimoclip_tpu.utils.logging import setup_logging


@dataclasses.dataclass
class _PendingVideo:
    """One video awaiting the batcher worker (one request may enqueue
    several)."""

    video: str
    motion: str | None
    top_k: int
    max_frames: int | None
    done: threading.Event = dataclasses.field(default_factory=threading.Event)
    result: object | None = None
    error: Exception | None = None


_SHUTDOWN = object()


class Overloaded(RuntimeError):
    """Backlog exceeds the batcher's bound — shed load instead of queueing
    unboundedly (HTTP answers 503 + Retry-After so clients back off)."""


class RequestTimeout(RuntimeError):
    """A request waited longer than the per-request deadline (HTTP 504).
    The work may still complete device-side; only the WAIT is abandoned."""


class DynamicBatcher:
    """Cross-request dynamic batching around a single-device predictor.

    Handler threads enqueue their request (all its videos, one atomic
    queue entry) and block; ONE worker thread drains the queue — waiting up
    to ``max_wait_ms`` after the first arrival to let concurrent requests
    pile on, stopping once ``max_batch`` videos have coalesced (a single
    oversized request still pools whole) — and runs
    the whole group through ``predictor.predict_batch`` (pooled embedding
    batches + one fusion call, measured 1.56x the serial per-video loop on
    the chip, bench.py serving section). The worker is the only predictor
    user, so no device lock is needed.

    Semantics are preserved exactly:
    - per-video ``top_k`` differs within a group: the pooled call asks for
      the group max and each response is sliced back (``top_classes`` is
      probability-ordered, so a prefix IS the smaller top-k);
    - videos with a precomputed motion file run serially inside the worker
      (the pooled path only covers the on-device frame-diff modality,
      mirroring handle_request's serial fallback);
    - ``max_frames`` changes the decoded input, so only videos with equal
      ``max_frames`` share a pooled call;
    - requires a batch-invariant predictor (serving.py masked pooling —
      coalesced output == solo output bit for bit). With
      --quirk-batch-pooling the daemon never constructs a batcher.

    Fault tolerance: if a pooled call raises (one unreadable path must not
    fail its co-batched neighbours from OTHER requests), the group retries
    serially and only the faulty videos carry errors.
    """

    def __init__(self, predictor, max_batch: int = 8,
                 max_wait_ms: float = 10.0, max_pending: int = 256,
                 request_timeout_s: float | None = None):
        self.predictor = predictor
        self.max_batch = max(1, int(max_batch))
        self.max_wait = max(0.0, float(max_wait_ms)) / 1e3
        self.max_pending = max(1, int(max_pending))
        self.request_timeout = (None if request_timeout_s is None
                                else max(0.0, float(request_timeout_s)))
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self._pending = 0  # videos enqueued but not yet done (backpressure)
        self._pending_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self._stats = {
            "requests": 0,          # videos submitted
            "predictor_calls": 0,   # device-side calls (pooled or serial)
            "pooled_videos": 0,     # videos served through pooled calls
            "max_coalesced": 0,     # largest pooled group so far
            "shed": 0,              # videos rejected by backpressure (503s)
            "timeouts": 0,          # requests abandoned past the deadline
        }
        self._worker = threading.Thread(
            target=self._run, name="vimo-batcher", daemon=True
        )
        self._worker.start()

    # -- handler-thread side ------------------------------------------------

    def predict_many(self, videos: list[str], motions: list[str | None],
                     top_k: int, max_frames: int | None) -> list:
        """Enqueue one request's videos, wait, return predictions in order.

        Raises the first per-video error (a request with a bad path fails
        whole, exactly like the direct predict_batch route — but co-batched
        OTHER requests are unaffected). Raises ``Overloaded`` when the
        backlog bound is hit (load shedding, HTTP 503) and
        ``RequestTimeout`` past the per-request deadline (HTTP 504; the
        enqueued work still completes device-side, only the wait is
        abandoned)."""
        items = [
            _PendingVideo(v, m, top_k, max_frames)
            for v, m in zip(videos, motions)
        ]
        # ONE queue entry per request: the worker sees the whole request
        # atomically, so a multi-video request always pools into one device
        # call even with --batch-wait-ms 0 (the wait only governs
        # coalescing ACROSS requests).
        if self._closed or not self._worker.is_alive():
            raise RuntimeError(
                "batcher is shut down or its worker died; restart the daemon"
            )
        with self._pending_lock:
            # backpressure: an unbounded queue under sustained overload
            # just grows until OOM while every client times out anyway —
            # shed load deterministically instead
            if self._pending + len(items) > self.max_pending:
                with self._stats_lock:
                    self._stats["shed"] += len(items)
                raise Overloaded(
                    f"backlog full ({self._pending} pending videos, "
                    f"limit {self.max_pending}); retry later"
                )
            self._pending += len(items)
        self._q.put(items)
        deadline = (None if self.request_timeout is None
                    else time.monotonic() + self.request_timeout)
        for item in items:
            # bounded waits with a liveness check: if the worker dies from
            # a non-Exception (MemoryError, interpreter teardown), handler
            # threads must error out instead of hanging their HTTP clients
            # forever on a done event nobody will ever set
            while True:
                remaining = (None if deadline is None
                             else deadline - time.monotonic())
                if remaining is not None and remaining <= 0:
                    with self._stats_lock:
                        self._stats["timeouts"] += 1
                    raise RequestTimeout(
                        f"request exceeded {self.request_timeout:.1f}s "
                        "deadline waiting for the batcher"
                    )
                wait = (1.0 if remaining is None else min(1.0, remaining))
                if item.done.wait(timeout=wait):
                    break
                if not self._worker.is_alive() and not item.done.is_set():
                    raise RuntimeError(
                        "batcher worker died mid-request; restart the daemon"
                    )
        for item in items:
            if item.error is not None:
                raise item.error
        return [item.result for item in items]

    def stats(self) -> dict:
        with self._stats_lock:
            return dict(self._stats)

    def shutdown(self) -> None:
        """Stop accepting, let the worker finish everything already queued
        (the sentinel is FIFO-ordered behind in-flight requests), then fail
        any stragglers that raced past the ``_closed`` check."""
        self._closed = True  # reject new requests before the sentinel lands
        self._q.put(_SHUTDOWN)
        self._worker.join(timeout=30)
        # a handler that passed the _closed check concurrently may have
        # enqueued BEHIND the sentinel after the worker's own drain ran —
        # fail those deterministically too instead of leaving their
        # handler threads to the 1s liveness poll
        self._drain_failed()

    # -- worker side ---------------------------------------------------------

    def _finish(self, item: _PendingVideo) -> None:
        with self._pending_lock:
            self._pending -= 1
        item.done.set()

    def _drain_failed(self) -> None:
        """Fail every still-queued item deterministically (shutdown path)."""
        while True:
            try:
                group = self._q.get_nowait()
            except queue.Empty:
                return
            if group is _SHUTDOWN:
                continue
            for item in group:
                if not item.done.is_set():
                    item.error = RuntimeError(
                        "batcher shut down before this request ran"
                    )
                    self._finish(item)

    def _run(self) -> None:
        while True:
            first = self._q.get()
            if first is _SHUTDOWN:
                self._drain_failed()
                return
            batch = list(first)
            deadline = time.monotonic() + self.max_wait
            stop = False
            # Queue entries are whole REQUESTS (atomic groups), so
            # max_batch caps cross-request coalescing — one oversized
            # request still runs as its own pooled call. Past the deadline
            # (incl. --batch-wait-ms 0) already-enqueued requests still
            # drain via get_nowait; the wait only gates requests that have
            # not arrived yet.
            while len(batch) < self.max_batch:
                wait = deadline - time.monotonic()
                try:
                    group = (self._q.get_nowait() if wait <= 0
                             else self._q.get(timeout=wait))
                except queue.Empty:
                    break
                if group is _SHUTDOWN:
                    stop = True
                    break
                batch.extend(group)
            try:
                self._process(batch)
            except Exception:  # noqa: BLE001 — the worker must never die
                logging.exception("batcher worker: unexpected group failure")
                for item in batch:
                    if not item.done.is_set():
                        item.error = item.error or RuntimeError(
                            "batcher worker failed; see daemon log"
                        )
                        self._finish(item)
            if stop:
                self._drain_failed()
                return

    def _serial(self, item: _PendingVideo) -> None:
        try:
            item.result = self.predictor.predict(
                item.video, motion_video_path=item.motion,
                top_k=item.top_k, max_frames=item.max_frames,
            )
        except Exception as e:  # noqa: BLE001 — per-video fault tolerance
            item.error = e
        finally:
            with self._stats_lock:
                self._stats["predictor_calls"] += 1
            self._finish(item)

    def _process(self, batch: list[_PendingVideo]) -> None:
        with self._stats_lock:
            self._stats["requests"] += len(batch)
        pooled: dict[int | None, list[_PendingVideo]] = {}
        for item in batch:
            if item.motion is not None:
                self._serial(item)
            else:
                pooled.setdefault(item.max_frames, []).append(item)
        for max_frames, items in pooled.items():
            if len(items) == 1:
                self._serial(items[0])
                continue
            group_k = max(i.top_k for i in items)
            try:
                preds = self.predictor.predict_batch(
                    [i.video for i in items], top_k=group_k,
                    max_frames=max_frames,
                )
            except Exception:  # noqa: BLE001 — isolate the faulty video
                logging.exception(
                    "pooled call failed; retrying %d videos serially",
                    len(items),
                )
                for item in items:
                    self._serial(item)
                continue
            if len(preds) != len(items):
                # a short prediction list would leave the tail's done
                # events forever unset (handler threads would spin on the
                # liveness poll against an alive-but-idle worker) — retry
                # serially so every item terminates deterministically
                logging.error(
                    "pooled call returned %d predictions for %d videos; "
                    "retrying serially", len(preds), len(items),
                )
                for item in items:
                    self._serial(item)
                continue
            with self._stats_lock:
                self._stats["predictor_calls"] += 1
                self._stats["pooled_videos"] += len(items)
                self._stats["max_coalesced"] = max(
                    self._stats["max_coalesced"], len(items)
                )
            for item, pred in zip(items, preds):
                item.result = dataclasses.replace(
                    pred, top_classes=pred.top_classes[: item.top_k]
                )
                self._finish(item)




def handle_request(predictor, req: dict, default_top_k: int = 5,
                   motion_videos_dir: str | None = None,
                   batcher: DynamicBatcher | None = None,
                   default_max_frames: int | None = None) -> dict:
    """One request -> one response dict (shared by both frontends).

    With ``batcher`` set (the HTTP frontend under dynamic batching), every
    video is enqueued instead of hitting the predictor directly, so videos
    from CONCURRENT requests share pooled device calls. The response is
    identical either way (batch-invariant pooling; tests/test_serve.py)."""
    from vimoclip_tpu.cli.predict import find_motion_match

    top_k = int(req.get("top_k", default_top_k))
    if "max_frames" in req:
        # explicit null in the request means "no cap", overriding the
        # daemon-level --max-frames default
        mf = req["max_frames"]
        max_frames = None if mf is None else int(mf)
    else:
        max_frames = default_max_frames
    if "videos" in req:
        videos = list(req["videos"])
        explicit = req.get("motion_videos")
        explicit = explicit if isinstance(explicit, dict) else {}
        # per-video resolution mirrors the single-video route: an explicit
        # entry wins, otherwise the --motion-videos-dir filename match —
        # a partial dict must not silently drop the dir fallback for the
        # videos it omits. "Present with null" differs from "absent": an
        # explicit null FORCES the on-device frame-diff path even when the
        # dir has a filename match.
        motions = [
            explicit[v] if v in explicit
            else find_motion_match(motion_videos_dir, v)
            for v in videos
        ]
        if batcher is not None:
            preds = batcher.predict_many(videos, motions, top_k, max_frames)
        elif any(m is not None for m in motions):
            # per-video motion files: the pooled path only covers the
            # on-device frame-diff modality, so fall back to serial
            preds = [
                predictor.predict(v, motion_video_path=m, top_k=top_k,
                                  max_frames=max_frames)
                for v, m in zip(videos, motions)
            ]
        else:
            preds = predictor.predict_batch(videos, top_k=top_k,
                                            max_frames=max_frames)
        return {"results": [prediction_record(v, p)
                            for v, p in zip(videos, preds)]}
    video = req["video"]
    # same "present with null differs from absent" rule as the batch route
    # above: an explicit null FORCES the on-device frame-diff path even
    # when --motion-videos-dir has a filename match
    motion = (req["motion_video"] if "motion_video" in req
              else find_motion_match(motion_videos_dir, video))
    if batcher is not None:
        pred = batcher.predict_many([video], [motion], top_k, max_frames)[0]
    else:
        pred = predictor.predict(video, motion_video_path=motion,
                                 top_k=top_k, max_frames=max_frames)
    return prediction_record(video, pred)


def serve_stdin(predictor, in_stream, out_stream, default_top_k: int = 5,
                motion_videos_dir: str | None = None,
                default_max_frames: int | None = None) -> int:
    """JSON-lines loop; returns the number of requests served. Per-request
    failures answer ``{"error": ...}`` and the loop continues (a bad path
    must not kill the daemon — the exporter's per-video fault-tolerance
    stance, reference inference_frame_diff.py:391-407)."""
    served = 0
    for line in in_stream:
        line = line.strip()
        if not line:
            continue
        try:
            resp = handle_request(
                predictor, json.loads(line), default_top_k, motion_videos_dir,
                default_max_frames=default_max_frames,
            )
        except Exception as e:  # noqa: BLE001 — fault-tolerant loop
            logging.exception("request failed")
            resp = {"error": str(e)}
        out_stream.write(json.dumps(resp) + "\n")
        out_stream.flush()
        served += 1
    return served


def make_http_server(predictor, host: str = "127.0.0.1", port: int = 0,
                     default_top_k: int = 5,
                     motion_videos_dir: str | None = None,
                     batcher: DynamicBatcher | None = None,
                     default_max_frames: int | None = None):
    """Build (without starting) the threaded HTTP server. Port 0 picks a
    free port (tests); ``server.server_address[1]`` has the real one.

    With ``batcher``, the batcher's worker thread is the sole predictor
    user — handler threads only enqueue and wait, so concurrent requests
    coalesce instead of serialising on a lock. Without one, a process-wide
    lock serialises device access (the pre-round-4 behavior, kept for
    --quirk-batch-pooling where coalescing would change outputs)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    lock = threading.Lock()  # one device — serialise predictor access

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict,
                   retry_after: float | None = None) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if retry_after is not None:
                self.send_header("Retry-After", str(int(max(1, retry_after))))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            elif self.path == "/stats":
                self._reply(200, batcher.stats() if batcher is not None
                            else {"dynamic_batching": False})
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                if batcher is not None:
                    resp = handle_request(
                        predictor, req, default_top_k, motion_videos_dir,
                        batcher=batcher, default_max_frames=default_max_frames,
                    )
                else:
                    with lock:
                        resp = handle_request(
                            predictor, req, default_top_k, motion_videos_dir,
                            default_max_frames=default_max_frames,
                        )
                self._reply(200, resp)
            except Overloaded as e:
                # load shedding: tell clients to back off instead of
                # letting the backlog (and their latency) grow unboundedly
                self._reply(503, {"error": str(e)}, retry_after=1.0)
            except RequestTimeout as e:
                self._reply(504, {"error": str(e)})
            except (json.JSONDecodeError, KeyError, TypeError,
                    ValueError, OSError) as e:
                # malformed request / bad path / unreadable video (OSError:
                # read_video's "could not open") — the CLIENT's fault,
                # retrying unchanged cannot succeed
                logging.exception("bad request")
                self._reply(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — fault-tolerant endpoint
                # server-side fault (device error, worker death, OOM) —
                # 5xx so load balancers / retry policies treat it as
                # transient instead of permanently-invalid input
                logging.exception("request failed server-side")
                self._reply(500, {"error": str(e)})

        def log_message(self, fmt, *fmt_args):
            logging.info("http: " + fmt, *fmt_args)

    return ThreadingHTTPServer((host, port), Handler)


def serve_http(server, batcher: DynamicBatcher | None = None,
               install_signal_handlers: bool = True) -> None:
    """Run the HTTP server until shutdown, with a graceful SIGTERM/SIGINT
    drain: stop the accept loop, let in-flight handler threads finish their
    responses (non-daemon threads — ``server_close`` JOINS them instead of
    abandoning them at interpreter exit), serve everything the batcher
    already queued, then return so the process exits 0 — the preemption
    story a TPU-fleet daemon needs. The signal handler only NUDGES
    ``server.shutdown()`` from a side thread because calling it from the
    serving thread deadlocks BaseServer's event wait."""
    server.daemon_threads = False
    if install_signal_handlers:
        draining = threading.Event()

        def _drain(signum, frame):
            if draining.is_set():
                # second signal: the documented hard-kill. A drain stuck on
                # a wedged predictor (no --request-timeout-s) must stay
                # interruptible, or the fleet's TERM+grace contract ends in
                # an unclean SIGKILL.
                logging.warning("signal %d again: hard exit", signum)
                signal.signal(signal.SIGTERM, signal.SIG_DFL)
                signal.signal(signal.SIGINT, signal.SIG_DFL)
                signal.raise_signal(signum)
                return
            draining.set()
            logging.info("signal %d: draining (no new connections)", signum)
            threading.Thread(target=server.shutdown, daemon=True).start()

        signal.signal(signal.SIGTERM, _drain)
        signal.signal(signal.SIGINT, _drain)
    try:
        server.serve_forever()
    finally:
        server.server_close()
        if batcher is not None:
            batcher.shutdown()
        logging.info("drained; exiting")


def main(argv: list[str] | None = None) -> None:
    from vimoclip_tpu.cli.predict import (
        add_model_args,
        build_predictor,
        validate_model_args,
    )

    p = argparse.ArgumentParser(
        description="Serve the fused ViMoCLIP cascade (stdin JSON lines or "
                    "HTTP)"
    )
    add_model_args(p)
    p.add_argument("--port", type=int, default=None,
                   help="serve HTTP on this port instead of stdin/stdout")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--probe-video", default=None,
                   help="video the --verify-fidelity probe samples at "
                        "startup (a daemon has no request video yet, so "
                        "the guard rail needs one explicitly; the daemon "
                        "refuses to start below --fidelity-threshold)")
    p.add_argument("--warmup", action="store_true",
                   help="run one throwaway predict on --probe-video before "
                        "accepting traffic: every device program along the "
                        "cascade compiles at startup instead of on the "
                        "first request (worth minutes on remote-compile "
                        "rigs; a request in a NEW length bucket still "
                        "compiles its small fusion program)")
    p.add_argument("--max-batch", type=int, default=8,
                   help="dynamic batching: stop coalescing further "
                        "requests once this many videos are grouped "
                        "(HTTP frontend; default 8; one bigger request "
                        "still pools whole)")
    p.add_argument("--batch-wait-ms", type=float, default=10.0,
                   help="dynamic batching: how long the worker waits after "
                        "the first queued video for concurrent requests to "
                        "pile on (default 10 ms; 0 disables the wait — "
                        "already-queued requests still coalesce, and a "
                        "multi-video request always pools whole)")
    p.add_argument("--max-pending", type=int, default=256,
                   help="backpressure bound: reject requests with 503 + "
                        "Retry-After once this many videos are queued but "
                        "not yet served (default 256)")
    p.add_argument("--request-timeout-s", type=float, default=None,
                   help="per-request deadline: a request still waiting on "
                        "the batcher past this many seconds answers 504 "
                        "(default: no deadline)")
    args = p.parse_args(argv)
    validate_model_args(p, args)
    if args.verify_fidelity and not args.probe_video:
        p.error("--verify-fidelity needs --probe-video PATH in the daemon "
                "(no request video exists at startup to sample from)")
    if args.warmup and not args.probe_video:
        p.error("--warmup needs --probe-video PATH (a representative video "
                "to compile the cascade on)")

    setup_logging()
    if args.output:
        logging.warning(
            "--output is ignored by the daemon: responses stream to "
            "stdout/HTTP per request (use vimo-predict for a JSON file)"
        )
    predictor = build_predictor(args, probe_video=args.probe_video)
    if args.warmup:
        t0 = time.monotonic()
        predictor.predict(args.probe_video, top_k=1)
        logging.info("warmup predict done in %.1fs (programs compiled)",
                     time.monotonic() - t0)
    logging.info("models resident; serving")
    if args.port is not None:
        batcher = None
        if not args.quirk_batch_pooling:
            batcher = DynamicBatcher(predictor, args.max_batch,
                                     args.batch_wait_ms,
                                     max_pending=args.max_pending,
                                     request_timeout_s=args.request_timeout_s)
        else:
            # batch-max pooling makes outputs depend on co-batched clips —
            # coalescing strangers' requests would be nondeterministic
            logging.info("dynamic batching disabled under "
                         "--quirk-batch-pooling (outputs would depend on "
                         "co-batched requests)")
        server = make_http_server(
            predictor, args.host, args.port, args.top_k,
            args.motion_videos_dir, batcher=batcher,
            default_max_frames=args.max_frames,
        )

        logging.info("listening on %s:%d (dynamic batching: %s)",
                     *server.server_address,
                     "on" if batcher else "off")
        serve_http(server, batcher)
    else:
        import sys

        n = serve_stdin(predictor, sys.stdin, sys.stdout, args.top_k,
                        args.motion_videos_dir,
                        default_max_frames=args.max_frames)
        logging.info("stdin closed after %d requests", n)


if __name__ == "__main__":
    main()

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
  probe). Requests are serialised around the single device; the server
  binds 127.0.0.1 by default (put a real ingress in front for anything
  else).

Responses use vimo-predict's record shape, so downstream consumers of its
``--output`` JSON parse daemon responses unchanged.
"""

from __future__ import annotations

import argparse
import json
import logging
import threading

from vimoclip_tpu.utils.logging import setup_logging


def prediction_record(video: str, pred) -> dict:
    """vimo-predict's per-video record shape (cli/predict.py)."""
    return {
        "video": video,
        "predictions": [
            {"class_id": cid, "class_name": name,
             "probability": round(prob, 4)}
            for cid, name, prob in pred.top_classes
        ],
    }


def handle_request(predictor, req: dict, default_top_k: int = 5,
                   motion_videos_dir: str | None = None) -> dict:
    """One request -> one response dict (shared by both frontends)."""
    from vimoclip_tpu.cli.predict import find_motion_match

    top_k = int(req.get("top_k", default_top_k))
    max_frames = req.get("max_frames")
    max_frames = None if max_frames is None else int(max_frames)
    if "videos" in req:
        videos = list(req["videos"])
        explicit = req.get("motion_videos")
        explicit = explicit if isinstance(explicit, dict) else {}
        # per-video resolution mirrors the single-video route: an explicit
        # entry wins, otherwise the --motion-videos-dir filename match —
        # a partial dict must not silently drop the dir fallback for the
        # videos it omits
        motions = [
            explicit.get(v) or find_motion_match(motion_videos_dir, v)
            for v in videos
        ]
        if any(m is not None for m in motions):
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
    motion = req.get("motion_video") or find_motion_match(
        motion_videos_dir, video
    )
    pred = predictor.predict(video, motion_video_path=motion, top_k=top_k,
                             max_frames=max_frames)
    return prediction_record(video, pred)


def serve_stdin(predictor, in_stream, out_stream, default_top_k: int = 5,
                motion_videos_dir: str | None = None) -> int:
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
                predictor, json.loads(line), default_top_k, motion_videos_dir
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
                     motion_videos_dir: str | None = None):
    """Build (without starting) the threaded HTTP server. Port 0 picks a
    free port (tests); ``server.server_address[1]`` has the real one."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    lock = threading.Lock()  # one device — serialise predictor access

    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
            if self.path == "/healthz":
                self._reply(200, {"status": "ok"})
            else:
                self._reply(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._reply(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(length) or b"{}")
                with lock:
                    resp = handle_request(
                        predictor, req, default_top_k, motion_videos_dir
                    )
                self._reply(200, resp)
            except Exception as e:  # noqa: BLE001 — fault-tolerant endpoint
                logging.exception("request failed")
                self._reply(400, {"error": str(e)})

        def log_message(self, fmt, *fmt_args):
            logging.info("http: " + fmt, *fmt_args)

    return ThreadingHTTPServer((host, port), Handler)


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
    args = p.parse_args(argv)
    validate_model_args(p, args)
    if args.verify_fidelity and not args.probe_video:
        p.error("--verify-fidelity needs --probe-video PATH in the daemon "
                "(no request video exists at startup to sample from)")

    setup_logging()
    predictor = build_predictor(args, probe_video=args.probe_video)
    logging.info("models resident; serving")
    if args.port is not None:
        server = make_http_server(
            predictor, args.host, args.port, args.top_k,
            args.motion_videos_dir,
        )
        logging.info("listening on %s:%d", *server.server_address)
        server.serve_forever()
    else:
        import sys

        n = serve_stdin(predictor, sys.stdin, sys.stdout, args.top_k,
                        args.motion_videos_dir)
        logging.info("stdin closed after %d requests", n)


if __name__ == "__main__":
    main()

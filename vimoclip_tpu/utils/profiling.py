"""Profiling: device traces, step annotations, and host-RSS monitoring.

The reference's only observability is wall-clock + a threaded RSS sampler +
torch CUDA memory counters in its benchmark script
(utils/video_benchmark_raft.py:35-66,269-279; SURVEY.md §5). Here profiling
is a first-class module:

- ``trace``: context manager around ``jax.profiler`` producing TensorBoard-
  viewable device traces (op-level timing on the TPU);
- ``annotate``: named ``TraceAnnotation`` for step phases;
- ``MemoryMonitor``: daemon-thread RSS sampler (reference parity);
- ``device_memory_stats``: live device memory (the TPU analogue of
  ``torch.cuda.max_memory_allocated``).
"""

from __future__ import annotations

import contextlib
import threading
import time


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class MemoryMonitor:
    """Samples host RSS on a daemon thread
    (video_benchmark_raft.py:35-66 parity)."""

    def __init__(self, interval_s: float = 0.1):
        self.interval_s = interval_s
        self.samples_mb: list[float] = []
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _rss_mb(self) -> float:
        try:
            import psutil

            return psutil.Process().memory_info().rss / 1e6
        except Exception:
            try:
                with open("/proc/self/status") as f:
                    for line in f:
                        if line.startswith("VmRSS"):
                            return int(line.split()[1]) / 1e3
            except Exception:
                pass
        return 0.0

    def __enter__(self):
        self._stop.clear()
        self.samples_mb = []

        def loop():
            while not self._stop.is_set():
                self.samples_mb.append(self._rss_mb())
                time.sleep(self.interval_s)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)

    @property
    def peak_mb(self) -> float:
        return max(self.samples_mb, default=0.0)

    @property
    def mean_mb(self) -> float:
        return sum(self.samples_mb) / len(self.samples_mb) if self.samples_mb else 0.0


def device_memory_stats() -> dict:
    """Per-device memory stats when the backend exposes them."""
    import jax

    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            stats = None
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out

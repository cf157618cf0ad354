"""Observability: TensorBoard scalars, python logging, step timing.

Reference parity: per-step and per-epoch TensorBoard scalars
(train.py:115-117,139-145; TFAM/train_and_eval.py:98-99), python logging to
``training.log`` + stdout (train_and_eval.py:25). The writer is gated so the
framework has no hard torch dependency at runtime.
"""

from __future__ import annotations

import logging
import time


def setup_logging(log_file: str | None = "training.log") -> None:
    handlers: list[logging.Handler] = [logging.StreamHandler()]
    if log_file:
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        handlers=handlers,
        force=True,
    )
    # Orbax/absl emit a screenful of INFO per checkpoint save; keep them quiet.
    for noisy in ("orbax", "absl", "jax._src"):
        logging.getLogger(noisy).setLevel(logging.WARNING)


class SummaryWriter:
    """TensorBoard scalar writer (no-op if tensorboard isn't importable)."""

    def __init__(self, log_dir: str):
        self._writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter as TBWriter

            self._writer = TBWriter(log_dir)
        except Exception:
            logging.warning("tensorboard unavailable; scalars will not be logged")

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), int(step))

    def add_histogram(self, tag: str, values, step: int) -> None:
        """Logits/label histograms, reference train.py:152-153."""
        if self._writer is not None:
            import numpy as np

            self._writer.add_histogram(tag, np.asarray(values), int(step))

    def add_text(self, tag: str, text: str, step: int) -> None:
        """Final-batch logits/labels text dumps, reference train.py:147-150."""
        if self._writer is not None:
            self._writer.add_text(tag, text, int(step))

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


def progress(iterable, desc: str = "", total: int | None = None):
    """tqdm progress bar (reference trainers use tqdm with live postfix);
    silent when stderr isn't a terminal (tests, batch jobs)."""
    import sys

    try:
        from tqdm import tqdm

        return tqdm(iterable, desc=desc, total=total,
                    disable=not sys.stderr.isatty())
    except ImportError:
        return iterable


class StepTimer:
    """Rolling step timer for steps/sec + examples/sec reporting."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._start = time.perf_counter()
        self._steps = 0
        self._examples = 0

    def tick(self, examples: int = 0) -> None:
        self._steps += 1
        self._examples += examples

    @property
    def steps_per_sec(self) -> float:
        dt = time.perf_counter() - self._start
        return self._steps / dt if dt > 0 else 0.0

    @property
    def examples_per_sec(self) -> float:
        dt = time.perf_counter() - self._start
        return self._examples / dt if dt > 0 else 0.0

"""Preemption-safe training: latch SIGTERM/SIGINT into a flag the train
loops poll, so a preempted run cuts a mid-epoch checkpoint (the trainers'
tested bit-identical resume mechanism, train/state.py) and exits cleanly
instead of losing the epoch.

TPU fleet preemption is the NORMAL case for long training jobs — the
reference has no training-job restart logic at all (SURVEY.md §5), so this
is framework surface the rebuild owns rather than parity. Both trainers
wrap their epoch loops in a ``PreemptionGuard``; on the first signal the
current step finishes, a ``step_N`` checkpoint with ``batch_in_epoch``
bookkeeping is written, and ``train()`` returns — rerunning with
``resume=True`` continues bit-identically (tests/test_preemption.py).
"""

from __future__ import annotations

import logging
import signal
import threading


class PreemptionGuard:
    """Context manager that traps SIGTERM/SIGINT while a train loop runs.

    - First signal: latches ``requested`` — the loop checkpoints and exits
      cleanly at the next step boundary.
    - Second signal: restores the original handlers and re-raises, so an
      operator (or an impatient fleet scheduler) can still hard-kill a run
      stuck inside a long device step.
    - Only installs from the main thread (``signal.signal`` raises
      elsewhere); library users training from worker threads keep their own
      signal handling and the guard degrades to an inert flag.
    """

    def __init__(self, signums=(signal.SIGTERM, signal.SIGINT)):
        self._signums = tuple(signums)
        self._event = threading.Event()
        self._previous: dict[int, object] = {}
        self._installed = False

    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def _handle(self, signum, frame):
        if self._event.is_set():
            # second signal: stop shielding — restore and re-deliver
            logging.warning(
                "second signal %d during preemption drain: restoring "
                "default handling", signum,
            )
            self._restore()
            signal.raise_signal(signum)
            return
        logging.warning(
            "signal %d: finishing the current step, checkpointing, and "
            "exiting cleanly (resume continues bit-identically)", signum,
        )
        self._event.set()

    def _restore(self) -> None:
        for signum, old in self._previous.items():
            signal.signal(signum, old)
        self._previous.clear()
        self._installed = False

    def __enter__(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for signum in self._signums:
                self._previous[signum] = signal.signal(signum, self._handle)
            self._installed = True
        return self

    def __exit__(self, *exc) -> None:
        if self._installed:
            self._restore()
        return None

"""Stall watchdog: detect a hung device backend and exit for a clean restart.

No direct reference counterpart — the reference's recovery model is
checkpoint-based restart (MonitoredTrainingSession restore,
distributed_model.py:616-619; SURVEY.md §5 "failure detection"), but its
liveness checks (`all(w.is_alive())`, distributed_model.py:528) only cover
process death, not a hang. The remote-TPU failure mode this rig exhibits —
the tunnel relay dies mid-run and every device fetch then blocks forever —
cannot be detected from inside the blocked host thread, so a daemon thread
tracks the age of the last completed training round and force-exits the
process with a distinct status code (``STALL_EXIT_CODE``). A supervisor
(``tools/run_queue.sh`` retries on that code) relaunches the run, which
resumes from the latest checkpoint (harness/checkpoint.py) — turning an
indefinite hang into a bounded restart.
"""

from __future__ import annotations

import os
import sys
import threading
import time

# distinct from SIGTERM's 143 and generic failures, so supervisors can
# tell "stalled, restart me" from "crashed, investigate"
STALL_EXIT_CODE = 43


class Watchdog:
    """Exits the process when `beat()` has not been called for `timeout_s`.

    timeout_s <= 0 disables the watchdog entirely (no thread started).
    The timeout must exceed the first XLA compile of the training round
    (~1-10 min over the remote tunnel) since the first beat only lands
    after the first round completes.
    """

    def __init__(self, timeout_s: float, poll_s: float = 10.0,
                 on_stall=None):
        self.timeout_s = float(timeout_s or 0.0)
        self._on_stall = on_stall or self._default_on_stall
        self._last = time.monotonic()
        self._stopped = False
        self._thread = None
        if self.timeout_s > 0:
            self._thread = threading.Thread(
                target=self._watch, args=(float(poll_s),), daemon=True,
                name="stall-watchdog")
            self._thread.start()

    def beat(self) -> None:
        self._last = time.monotonic()

    def grace(self, window_s: float) -> None:
        """Extend the current stall window to at least ``window_s`` seconds
        from now, without changing the steady-state timeout. Used before a
        known-long one-off (the first train-round / evaluator XLA compile,
        which can exceed a steady-state-tuned timeout several-fold over
        the remote-compile tunnel); the next beat() returns the cadence to
        normal."""
        if self.timeout_s > 0 and window_s > self.timeout_s:
            self._last = time.monotonic() + window_s - self.timeout_s

    def stop(self) -> None:
        self._stopped = True

    # -- internals --------------------------------------------------------
    def _default_on_stall(self, age: float) -> None:
        print(f"[SYSTEM] stall watchdog: no training progress for "
              f"{age:.0f}s (timeout {self.timeout_s:.0f}s); exiting "
              f"{STALL_EXIT_CODE} so a supervisor can restart from the "
              f"latest checkpoint", flush=True)
        sys.stderr.flush()
        os._exit(STALL_EXIT_CODE)  # a blocked device call cannot be unwound

    def _watch(self, poll_s: float) -> None:
        while not self._stopped:
            time.sleep(poll_s)
            if self._stopped:
                return
            age = time.monotonic() - self._last
            if age > self.timeout_s:
                self._on_stall(age)
                return

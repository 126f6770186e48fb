"""Orbax checkpointing of full training state.

Replaces the reference's MonitoredTrainingSession saver
(distributed_model.py:605-624): checkpoints carry everything that matters —
params, optimizer slots, normalizer stats, particle state + resample
counters, env states and RNG keys (SURVEY.md §5 "Checkpoint / resume").
Resume is implicit: restore_latest() on startup, like the chief's session
bootstrap.

The off-policy replay ring (SACState.buffer, ~1.7 GB device-resident at
capacity 1e6) is NOT checkpointed — matching the reference, whose `Buffer`
is a plain Python object outside the TF saver's variable set
(workers/ddpg.py:11-27): resume restarts with an empty buffer. Saving it
would also write gigabytes every 1000 optimizer steps.
"""

from __future__ import annotations

import os
import time
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

_SKIP_FIELDS = ("buffer",)


def _strip(state: Any) -> Any:
    """Replace non-checkpointed fields (replay ring) with None subtrees."""
    repl = {f: None for f in _SKIP_FIELDS if hasattr(state, f)
            and getattr(state, f) is not None}
    return state.replace(**repl) if repl else state


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 1):
        self.directory = os.path.abspath(directory)
        self._max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any):
        self._mgr.save(step, args=ocp.args.StandardSave(_strip(state)))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_latest(self, template: Any) -> Optional[Any]:
        """Restore the newest checkpoint, or None when there is none or it
        is incompatible with the current state layout.

        Tolerant restore (PARITY.md deviation 13): a checkpoint written by
        an older code version (different tree structure) must not brick the
        implicit startup resume — log and train from scratch instead, like
        the reference chief starting fresh when no restorable state exists.
        """
        step = self._mgr.latest_step()
        if step is None:
            return None
        try:
            restored = self._restore_retrying(step, template)
        except (ValueError, KeyError, TypeError) as e:
            # tree-structure/dtype mismatch from an old state layout —
            # preserve the old checkpoint (max_to_keep=1 would otherwise
            # overwrite it on the next save), then start fresh. Transient
            # backend/IO errors are NOT classified here: _restore_retrying
            # retries them and then re-raises, so a flaky tunnel can never
            # silently restart a long run from scratch.
            aside = f"{self.directory}.incompatible.{step}"
            n = 0
            while os.path.exists(aside):  # unique target: rename onto an
                n += 1                    # existing dir raises ENOTEMPTY
                aside = f"{self.directory}.incompatible.{step}.{n}"
            moved = ""
            try:
                os.rename(os.path.join(self.directory, str(step)), aside)
                # build the replacement manager BEFORE closing the old one
                # so a creation failure never leaves self._mgr closed
                new_mgr = ocp.CheckpointManager(
                    self.directory,
                    options=ocp.CheckpointManagerOptions(
                        max_to_keep=self._max_to_keep, create=True),
                )
                self._mgr.close()
                self._mgr = new_mgr
                moved = f"; moved aside to {aside}"
            except OSError:
                pass
            print(f"[SYSTEM] checkpoint at step {step} is incompatible with "
                  f"the current state layout ({type(e).__name__}); starting "
                  f"fresh{moved}", flush=True)
            return None
        # re-attach the template's fresh (empty) versions of skipped fields
        keep = {f: getattr(template, f) for f in _SKIP_FIELDS
                if hasattr(template, f) and getattr(template, f) is not None}
        return restored.replace(**keep) if keep else restored

    def _restore_retrying(self, step: int, template: Any,
                          tries: int = 3, cooldown_s: float = 120.0) -> Any:
        """Restore with retries for transient (non-layout) errors.

        Layout mismatches (ValueError/KeyError/TypeError) propagate on the
        first attempt — retrying cannot fix those. Anything else (remote
        backend hiccups, flaky IO) is retried with a cooldown; if it still
        fails, the error propagates so the failure is loud instead of
        silently discarding the run's progress.
        """
        for attempt in range(tries):
            try:
                return self._mgr.restore(
                    step, args=ocp.args.StandardRestore(_strip(template)))
            except (ValueError, KeyError, TypeError):
                raise
            except Exception as e:  # noqa: BLE001 — transient classification
                if attempt == tries - 1:
                    raise
                print(f"[SYSTEM] checkpoint restore attempt {attempt + 1} "
                      f"failed ({type(e).__name__}); retrying in "
                      f"{cooldown_s:.0f}s", flush=True)
                time.sleep(cooldown_s)

    def close(self):
        self._mgr.close()

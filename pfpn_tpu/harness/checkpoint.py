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
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

_SKIP_FIELDS = ("buffer",)


def _path_key(entry) -> str:
    """Normalize a jax tree-path entry to the string key orbax stores."""
    if isinstance(entry, jax.tree_util.GetAttrKey):
        return entry.name
    if isinstance(entry, jax.tree_util.DictKey):
        return str(entry.key)
    if isinstance(entry, jax.tree_util.SequenceKey):
        return str(entry.idx)
    if isinstance(entry, jax.tree_util.FlattenedIndexKey):
        return str(entry.key)
    return str(entry)


def _flatten_raw(raw: Any, prefix: tuple = ()) -> dict:
    """Flatten orbax's raw (nested dict/list) restore into path -> leaf."""
    if isinstance(raw, dict):
        out = {}
        for k, v in raw.items():
            out.update(_flatten_raw(v, prefix + (str(k),)))
        return out
    if isinstance(raw, (list, tuple)):
        out = {}
        for i, v in enumerate(raw):
            out.update(_flatten_raw(v, prefix + (str(i),)))
        return out
    if raw is None:
        return {}
    return {prefix: raw}


def _graft(template: Any, raw: Any):
    """Merge a stored raw tree into ``template`` by path.

    Supports *additive* state evolution: leaves present in the template but
    absent from the checkpoint (fields added since the save) keep their
    template init values; stored leaves absent from the template (fields
    removed) are dropped. Any shape or unconvertible-dtype conflict on a
    shared leaf raises ValueError — that is a genuine layout change and the
    move-aside path must handle it.

    Returns (state, filled_paths, dropped_paths).
    """
    stored = _flatten_raw(raw)
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    filled, out_leaves = [], []
    used = set()
    for path, leaf in leaves_with_paths:
        key = tuple(_path_key(p) for p in path)
        if key not in stored:
            filled.append("/".join(key))
            out_leaves.append(leaf)
            continue
        used.add(key)
        val = stored[key]
        t_shape = tuple(getattr(leaf, "shape", ()))
        v_shape = tuple(getattr(val, "shape", ()))
        if t_shape != v_shape:
            raise ValueError(
                f"checkpoint leaf {'/'.join(key)} has shape {v_shape}, "
                f"state expects {t_shape}")
        if hasattr(leaf, "dtype"):
            out_leaves.append(jnp.asarray(np.asarray(val), dtype=leaf.dtype))
        else:
            out_leaves.append(type(leaf)(val))
    dropped = sorted("/".join(k) for k in set(stored) - used)
    return jax.tree_util.tree_unflatten(treedef, out_leaves), filled, dropped


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
            # First, try to graft: a checkpoint from an older code version
            # whose only difference is fields added (or removed) since the
            # save — e.g. SACState.ou_state — must not cost a long run its
            # progress. Shape/dtype conflicts still fall through.
            grafted = self._try_graft(step, template, e)
            if grafted is not None:
                return grafted
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

    def _try_graft(self, step: int, template: Any,
                   orig: Exception) -> Optional[Any]:
        """Attempt an additive-evolution restore (see _graft).

        Returns the grafted state with skipped fields re-attached, or None
        when the checkpoint is genuinely incompatible (shared-leaf shape
        conflict, or nothing stored matches the state at all)."""
        stripped = _strip(template)
        try:
            raw = self._mgr.restore(step)
            grafted, filled, dropped = _graft(stripped, raw)
        except (ValueError, KeyError, TypeError):
            return None  # layout conflict even under graft -> move aside
        # anything else (transient backend/IO) propagates: loud failure,
        # never a silent restart from scratch (same rule as
        # _restore_retrying's classification)
        n_leaves = len(jax.tree_util.tree_leaves(stripped))
        if len(filled) >= n_leaves:  # nothing matched: not additive drift
            return None
        print(f"[SYSTEM] checkpoint at step {step} predates the current "
              f"state layout ({type(orig).__name__}); grafted it — "
              f"{len(filled)} new field(s) kept init values "
              f"{filled[:8]}{'...' if len(filled) > 8 else ''}, "
              f"{len(dropped)} stored field(s) dropped "
              f"{dropped[:8]}{'...' if len(dropped) > 8 else ''}", flush=True)
        keep = {f: getattr(template, f) for f in _SKIP_FIELDS
                if hasattr(template, f) and getattr(template, f) is not None}
        return grafted.replace(**keep) if keep else grafted

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

"""Metrics / logging: throttled console lines + JSONL + optional TensorBoard.

Mirrors the reference's three channels (SURVEY.md §5): [TRAIN] console lines
throttled to one per 10 s (base_worker.py:136-150), [PERFORM] evaluator lines
(distributed_model.py:253-256), and per-step summaries (TensorBoard when a
writer backend is importable, JSONL always).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, log_dir: str, console_interval: float = 10.0):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._last_console = 0.0
        self.console_interval = console_interval
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # torch-cpu is baked in

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def log_histograms(self, step: int, arrays: Dict[str, "object"],
                       prefix: str = ""):
        """Histogram summaries (reference models/utils.py:17-31 reflects any
        non-scalar `summaries` entry into a histogram; the reference logs
        per-dimension particle locations/stds and continuous actions,
        a2c.py:336-344). JSONL records percentiles; TB gets the full
        histogram."""
        import numpy as np

        rec = {"step": int(step), "time": time.time()}
        for k, v in arrays.items():
            arr = np.asarray(v).reshape(-1)
            if arr.size == 0:
                continue
            key = f"{prefix}{k}"
            rec[f"{key}/p5"], rec[f"{key}/p50"], rec[f"{key}/p95"] = (
                float(x) for x in np.percentile(arr, [5, 50, 95]))
            if self._tb is not None:
                self._tb.add_histogram(key, arr, int(step))
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        rec = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            try:
                rec[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, rec[key], int(step))
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def console(self, tag: str, step: int, metrics: Dict[str, float],
                force: bool = False):
        now = time.time()
        if not force and now - self._last_console < self.console_interval:
            return
        self._last_console = now
        parts = " ".join(
            f"{k}: {float(v):.4f}" for k, v in metrics.items()
            if _is_scalar(v)
        )
        print(f"[{tag}] step {int(step)} {parts} "
              f"{time.strftime('%m-%d %H:%M:%S')}", flush=True)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def _is_scalar(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False

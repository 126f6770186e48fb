"""Profiling / tracing subsystem (SURVEY.md §5: the reference has none).

Wraps jax.profiler into simple entry points:

    from pfpn_tpu.utils.profiling import trace, annotate

    with trace("/tmp/tb"):               # XLA + TPU trace viewable in
        state, m = train_round(state)    # TensorBoard's profile plugin

    with annotate("rollout"):            # named region in the trace
        ...

Set PFPN_XLA_DUMP=/path to also dump XLA HLO for compiler inspection.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def enable_xla_dump(path: str | None = None):
    """Call before the first jit compilation."""
    path = path or os.environ.get("PFPN_XLA_DUMP")
    if path:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = f"{flags} --xla_dump_to={path}".strip()

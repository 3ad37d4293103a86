"""Profiling hooks (absent from the reference — SURVEY.md §5.1).

``profile_trace`` wraps a code region with jax.profiler so traces open in
TensorBoard / Perfetto; cheap no-op when disabled.
"""

from __future__ import annotations

import contextlib
import os

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/r3d_trace", enabled: bool = True):
    """with profile_trace('...'): run_steps()  -> XLA trace in log_dir."""
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)

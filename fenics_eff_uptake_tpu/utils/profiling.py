"""Optional JAX profiler hooks (SURVEY.md 5.1: the reference has none).

Usage:
    with device_trace("/tmp/feu_trace"):
        solve_sweep(...)
then open the trace in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import os

__all__ = ["device_trace", "annotate"]


@contextlib.contextmanager
def device_trace(log_dir):
    import jax
    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:
        print(f"[profiling] trace unavailable: {e}")
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def annotate(name):
    """TraceAnnotation context (shows up in device traces)."""
    import jax
    return jax.profiler.TraceAnnotation(name)

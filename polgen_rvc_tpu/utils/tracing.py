"""Profiling hooks: the jax.profiler equivalent of the reference's (absent)
tracing subsystem (SURVEY §5.1).

Usage:
    with maybe_profile("/tmp/trace"):        # or POLGEN_PROFILE_DIR env var
        converter.convert(audio, opts)
Produces a TensorBoard-loadable trace of host + TPU activity. Stage-level
wall-clock timing comes from ProgressReporter timestamps.
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional


@contextlib.contextmanager
def maybe_profile(trace_dir: Optional[str] = None):
    trace_dir = trace_dir or os.environ.get("POLGEN_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield
    print(f"[profile] trace written to {trace_dir}")


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces (host + device timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield

"""Profiling / tracing helpers.

The reference has no profiler integration (SURVEY.md 5.1 — manual
wall-clock only). TPU-native equivalents:

  * ``trace(dir)`` — context manager around ``jax.profiler`` producing
    a TensorBoard-loadable device trace;
  * ``timed(tag)`` — wall-clock stage timer that *fences with a value
    fetch* (async dispatch makes naive timing meaningless on TPU; see
    bench.py);
  * ``annotate(name)`` — ``TraceAnnotation`` wrapper so host-side
    stages show up inside device traces.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``
    (view with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


class timed:
    """Stage timer: ``with timed("flow") as t: out = f(x)``; reading
    ``t.seconds`` AFTER the block fences on ``t.result`` if set."""

    def __init__(self, tag: str = "", fence=None):
        self.tag = tag
        self.result = fence
        self.seconds = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.result is not None:
            leaves = jax.tree.leaves(self.result)
            if leaves:
                np.asarray(leaves[0]).ravel()[:1]
        self.seconds = time.perf_counter() - self._t0
        return False

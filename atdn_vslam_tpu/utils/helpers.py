"""Logging + timing helpers (ref: atdn_vslam/utils/helpers.py:7-111).

``Clock`` additionally synchronizes the device before reading the
wall clock (``block_until_ready``) — on TPU, dispatch is async and the
reference-style ``time.time()`` pairs would measure nothing.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def log(*args) -> None:
    """Dashed-banner print (ref: helpers.py:7-22)."""
    msg = " ".join(str(a) for a in args)
    print("-" * max(len(msg), 8))
    print(msg)
    print("-" * max(len(msg), 8))


class Clock:
    """tick/tock timer with optional device sync and txt flush
    (ref: helpers.py:43-88)."""

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.times: list[float] = []
        self._start: float | None = None

    def tick(self) -> None:
        self._start = time.perf_counter()

    def tock(self, result=None) -> float:
        if self.sync and result is not None:
            jax.block_until_ready(result)
        if self._start is None:
            raise RuntimeError("tock() without tick()")
        dt = time.perf_counter() - self._start
        self.times.append(dt)
        self._start = None
        return dt

    def __enter__(self):
        self.tick()
        return self

    def __exit__(self, *exc):
        self.tock()
        return False

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    @property
    def total(self) -> float:
        return float(np.sum(self.times))

    def save(self, path: str) -> None:
        np.savetxt(path, np.asarray(self.times))


def shape_log(tag: str, x) -> None:
    """Debug shape print for pytrees (ref: ShapeLogLayer,
    helpers.py:25-40 — there a nn.Module; here a function usable inside
    traced code via jax.debug)."""
    shapes = jax.tree.map(lambda a: tuple(a.shape), x)
    print(f"[shape] {tag}: {shapes}")


class BetaScheduler:
    """Linear KLD-weight warmup (ref: helpers.py:91-111)."""

    def __init__(self, warmup_steps: int, beta_max: float = 1.0):
        self.warmup_steps = max(warmup_steps, 1)
        self.beta_max = beta_max

    def __call__(self, step: int) -> float:
        return self.beta_max * min(step / self.warmup_steps, 1.0)

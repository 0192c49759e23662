"""Timing & profiling helpers.

TPU analogue of the reference's OroStopwatch event timing
(reference: unittest.cpp:513-520, main.cpp:154-167) plus jax.profiler trace
capture for per-kernel breakdowns (the reference's commented-out per-kernel
scaffolding, hpp:882-928, becomes a real profiler here).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

__all__ = ["Stopwatch", "time_fn", "trace"]


def _force(result):
    """Force end-to-end completion: fetch one element of every leaf to host
    (block_until_ready alone does not flush async dispatch tunnels)."""
    for leaf in jax.tree.leaves(result):
        if hasattr(leaf, "shape") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[-1:])
        else:
            jax.block_until_ready(leaf)


class Stopwatch:
    """Wall-clock stopwatch around device work (OroStopwatch parity)."""

    def __init__(self):
        self._t0 = None
        self.elapsed_s = 0.0

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, result=None) -> float:
        if result is not None:
            _force(result)
        self.elapsed_s = time.perf_counter() - self._t0
        return self.elapsed_s

    @property
    def ms(self) -> float:
        return self.elapsed_s * 1e3


def time_fn(fn, *args, reps: int = 5, warmup: int = 1,
            subtract_floor: bool = True):
    """Best-of-reps device time for fn(*args).

    Subtracts the dispatch/readback floor measured with an identity-plus-one
    op on the first argument (the tunneled-RPC analogue of event timing).
    Returns (best_seconds, floor_seconds).
    """
    for _ in range(max(warmup, 1)):
        _force(fn(*args))
    best = min(_timed(fn, args) for _ in range(reps))
    floor = 0.0
    if subtract_floor and args:
        leaf = jax.tree.leaves(args[0])[0]
        triv = jax.jit(lambda a: a + a.dtype.type(1) if a.dtype != bool else a)
        _force(triv(leaf))
        floor = min(_timed(triv, (leaf,)) for _ in range(reps))
    return max(best - floor, 0.0), floor


def _timed(fn, args) -> float:
    t0 = time.perf_counter()
    _force(fn(*args))
    return time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/thrs_trace"):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()

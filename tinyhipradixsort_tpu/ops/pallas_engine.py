"""Pallas TPU radix-sort pipeline (the single-chip speed path).

Placeholder delegating to the counting engine; replaced by real Pallas kernels
(histogram / scan / stable reorder) in this round — see ops/counting_engine.py
for the pass structure the kernels implement.
"""

from __future__ import annotations

from . import counting_engine


def sort_arrays_pallas(bits, arrays, start_bit, end_bit):
    return counting_engine.sort_arrays_counting(bits, arrays, start_bit, end_bit)

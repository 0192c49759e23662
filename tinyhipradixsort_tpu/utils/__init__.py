"""Utilities: deterministic PRNG for tests/benchmarks, timing helpers."""

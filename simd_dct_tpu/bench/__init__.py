"""Benchmark harness (≙ the reference's rdtsc/QPC statistics loop)."""

from .stats import (
    MAX_RUN_COUNT, DEFAULT_RUN_COUNT, RunStats, HEADER, time_fn,
)

__all__ = ["MAX_RUN_COUNT", "DEFAULT_RUN_COUNT", "RunStats", "HEADER",
           "time_fn"]

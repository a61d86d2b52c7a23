"""Auxiliary subsystems: profiling/roofline, debug/determinism."""

from .profiling import (
    HBM_PEAK_GBPS, hbm_peak_gbps, RooflineReport, device_timer, trace, measure,
)
from .debug import interpret_kernels, check_deterministic, compare_backends
from .metrics import psnr, mse

__all__ = [
    "HBM_PEAK_GBPS", "hbm_peak_gbps", "RooflineReport", "device_timer",
    "trace", "measure",
    "interpret_kernels", "check_deterministic", "compare_backends",
    "psnr", "mse",
]

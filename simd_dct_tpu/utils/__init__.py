"""Auxiliary subsystems: profiling/roofline, debug/determinism."""

from .profiling import (
    CHIP_SPECS, ChipSpec, chip_spec, hbm_peak_gbps, RooflineReport,
    device_timer, trace, measure,
)
from .debug import interpret_kernels, check_deterministic, compare_backends
from .feed import (FrameFeeder, stream_roundtrip32,
                   stream_encode32_compressed,
                   stream_decode32_compressed)
from .metrics import psnr, mse

__all__ = [
    "CHIP_SPECS", "ChipSpec", "chip_spec", "hbm_peak_gbps",
    "RooflineReport", "device_timer", "trace", "measure",
    "interpret_kernels", "check_deterministic", "compare_backends",
    "psnr", "mse",
    "FrameFeeder", "stream_roundtrip32", "stream_encode32_compressed",
    "stream_decode32_compressed",
]

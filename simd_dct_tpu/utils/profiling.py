"""Profiling / roofline reporting (≙ the reference's rdtsc+mfence harness,
src/main.cpp:508-592, re-expressed for TPU: device-synchronized walls,
jax.profiler traces, and fraction-of-HBM-roofline reporting)."""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

# Per-generation chip specs (the TPU analog of the reference's model →
# architecture-name table, src/simd_platform.c:180-252).  Peak HBM GB/s and
# dense bf16 MXU TFLOP/s per chip, from published generation specs.  Used
# for roofline fractions when a measured copy roofline is unavailable.
@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str           # marketing name, ≙ _GetCPUArchitectureName output
    hbm_gbps: float     # peak HBM bandwidth per chip
    bf16_tflops: float  # peak dense bf16 matmul throughput per chip
    hbm_gib: float      # HBM capacity per chip


# Ordered longest-prefix-first so e.g. "TPU v5p" wins over "TPU v5".
CHIP_SPECS = {
    "TPU v2": ChipSpec("TPU v2", 700.0, 46.0, 8.0),
    "TPU v3": ChipSpec("TPU v3", 900.0, 123.0, 16.0),
    "TPU v4 lite": ChipSpec("TPU v4i", 614.0, 138.0, 8.0),
    "TPU v4": ChipSpec("TPU v4", 1228.0, 275.0, 32.0),
    "TPU v5 lite": ChipSpec("TPU v5e", 819.0, 197.0, 16.0),
    "TPU v5e": ChipSpec("TPU v5e", 819.0, 197.0, 16.0),
    "TPU v5p": ChipSpec("TPU v5p", 2765.0, 459.0, 95.0),
    "TPU v5": ChipSpec("TPU v5p", 2765.0, 459.0, 95.0),
    "TPU v6 lite": ChipSpec("TPU v6e (Trillium)", 1640.0, 918.0, 32.0),
    "TPU v6e": ChipSpec("TPU v6e (Trillium)", 1640.0, 918.0, 32.0),
    "TPU v7": ChipSpec("TPU v7 (Ironwood)", 7370.0, 2307.0, 192.0),
    "TPU7x": ChipSpec("TPU v7 (Ironwood)", 7370.0, 2307.0, 192.0),
}


def chip_spec(device_kind: str | None = None) -> ChipSpec | None:
    """Longest-prefix spec lookup; None for unknown kinds (callers must
    report 'unknown roofline' rather than assume a generation)."""
    if device_kind is None:
        device_kind = jax.devices()[0].device_kind
    best = None
    for k, v in CHIP_SPECS.items():
        if device_kind.startswith(k) and (best is None or len(k) > best[0]):
            best = (len(k), v)
    return best[1] if best else None


def hbm_peak_gbps(device_kind: str | None = None) -> float | None:
    """Peak HBM GB/s for the device kind, or None when unknown."""
    spec = chip_spec(device_kind)
    return spec.hbm_gbps if spec else None


@dataclasses.dataclass
class RooflineReport:
    bytes_processed: int
    seconds: float
    device_kind: str

    @property
    def gbps(self) -> float:
        return self.bytes_processed / self.seconds / 1e9

    @property
    def fraction_of_roofline(self) -> float | None:
        peak = hbm_peak_gbps(self.device_kind)
        return None if peak is None else self.gbps / peak

    def __str__(self) -> str:
        frac = self.fraction_of_roofline
        if frac is None:
            return (f"{self.gbps:.1f} GB/s on {self.device_kind} "
                    f"(unknown roofline for this device kind)")
        return (f"{self.gbps:.1f} GB/s on {self.device_kind} "
                f"({100 * frac:.1f}% of "
                f"{hbm_peak_gbps(self.device_kind):.0f} GB/s HBM roofline)")


@contextlib.contextmanager
def device_timer():
    """Wall-clock a device region; the result object gains ``.seconds``
    after the block exits.  The caller must block on outputs inside the
    block (block_until_ready) for the wall to be meaningful."""
    class _T:
        seconds = None
    t = _T()
    t0 = time.perf_counter()
    try:
        yield t
    finally:
        t.seconds = time.perf_counter() - t0


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace wrapper (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure(fn, args=(), *, bytes_processed: int, runs: int = 16,
            warmup: int = 2) -> RooflineReport:
    """Pipelined-dispatch measurement: enqueue ``runs`` calls, sync once
    (amortizes per-call dispatch latency, which can reach tens of ms
    through remote-tunnel platforms)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    results = [fn(*args) for _ in range(runs)]
    jax.block_until_ready(results)
    dt = (time.perf_counter() - t0) / runs
    return RooflineReport(bytes_processed=bytes_processed, seconds=dt,
                          device_kind=jax.devices()[0].device_kind)

"""Profiling / roofline reporting (≙ the reference's rdtsc+mfence harness,
src/main.cpp:508-592, re-expressed for TPU: device-synchronized walls,
jax.profiler traces, and fraction-of-HBM-roofline reporting)."""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax

# Published peak HBM bandwidth per chip by device kind (GB/s).  Used for
# roofline fractions when a measured copy roofline is unavailable.
HBM_PEAK_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5e": 819.0,
    "TPU v5": 2765.0,       # v5p
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,  # v6e (Trillium)
    "TPU v6e": 1640.0,
}


def hbm_peak_gbps(device_kind: str | None = None) -> float:
    if device_kind is None:
        device_kind = jax.devices()[0].device_kind
    for k, v in HBM_PEAK_GBPS.items():
        if device_kind.startswith(k):
            return v
    return 819.0  # conservative default


@dataclasses.dataclass
class RooflineReport:
    bytes_processed: int
    seconds: float
    device_kind: str

    @property
    def gbps(self) -> float:
        return self.bytes_processed / self.seconds / 1e9

    @property
    def fraction_of_roofline(self) -> float:
        return self.gbps / hbm_peak_gbps(self.device_kind)

    def __str__(self) -> str:
        return (f"{self.gbps:.1f} GB/s on {self.device_kind} "
                f"({100 * self.fraction_of_roofline:.1f}% of "
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

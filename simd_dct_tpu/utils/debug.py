"""Debug & verification aids (SURVEY.md §5 "race detection / sanitizers"
row): interpreter-mode execution and determinism checks — the TPU
equivalents of running the reference at ``--max-simd none`` and diffing
dumps (src/main.cpp:426, the stated testing workflow)."""

from __future__ import annotations

import contextlib

import numpy as np
import jax


@contextlib.contextmanager
def interpret_kernels():
    """Force every Pallas kernel onto the interpreter (slow, portable,
    exact reference for the compiled kernels)."""
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


def check_deterministic(fn, args=(), runs: int = 3) -> bool:
    """Run ``fn`` repeatedly and verify bit-identical outputs.  All
    framework paths are deterministic (no atomics, no reductions with
    nondeterministic order); a False here indicates a real defect."""
    ref = None
    for _ in range(runs):
        out = jax.block_until_ready(fn(*args))
        leaves = [np.asarray(x) for x in jax.tree.leaves(out)]
        if ref is None:
            ref = leaves
        elif len(leaves) != len(ref) or not all(
                np.array_equal(a, b) for a, b in zip(ref, leaves)):
            return False
    return True


def compare_backends(encode_calls: dict[str, object], *,
                     max_abs_diff: int = 1,
                     max_mismatch_rate: float = 0.002) -> dict[str, dict]:
    """Cross-backend diff report (≙ dumping --max-simd variants and
    diffing): every pair of encode outputs must agree within the
    documented +-1 rounding-boundary contract."""
    names = list(encode_calls)
    outs = {n: np.asarray(encode_calls[n]).reshape(-1) for n in names}
    report = {}
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            diff = outs[a].astype(np.int16) - outs[b].astype(np.int16)
            n_bad = int(np.count_nonzero(diff))
            entry = {
                "max_abs_diff": int(np.abs(diff).max(initial=0)),
                "mismatch_rate": n_bad / diff.size,
                "ok": (np.abs(diff).max(initial=0) <= max_abs_diff
                       and n_bad <= diff.size * max_mismatch_rate),
            }
            report[f"{a}-vs-{b}"] = entry
    return report

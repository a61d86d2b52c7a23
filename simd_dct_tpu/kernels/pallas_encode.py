"""Fused Pallas TPU encode kernels (the AVX-512-analog fast path).

Placeholder module: mode kernels are registered here as they land; the
api layer falls back to the XLA tier for any mode without a Pallas kernel.
"""

# Populated incrementally; see kernels/pallas_dct.py for the fused kernels.

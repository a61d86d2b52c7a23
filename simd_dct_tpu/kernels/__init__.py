"""Compute kernels: the MXU panel engine (panel.py), the portable XLA
tier (xla_path.py), the fused Pallas TPU kernels (pallas_dct.py), the
fused YCbCr color kernels (color32.py), and the strict-IEEE compat
engine (compat.py)."""

"""Compute kernels: the MXU panel engine (panel.py), the portable XLA
tier (xla_path.py), and the fused Pallas TPU kernels (pallas_dct.py,
registered for dispatch in pallas_encode.py)."""

"""Backend capability probe and tier dispatch (≙ platform layer + dispatch)."""

from .capability import (
    TIERS, DeviceInfo, probe, set_max_backend, get_max_backend,
    available_tiers, select_backend,
)

__all__ = [
    "TIERS", "DeviceInfo", "probe", "set_max_backend", "get_max_backend",
    "available_tiers", "select_backend",
]

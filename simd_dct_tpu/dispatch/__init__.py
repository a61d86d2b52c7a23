"""Backend capability probe and tier dispatch (≙ platform layer + dispatch)."""

from .capability import (
    TIERS, DeviceInfo, honor_cpu_platform_env, probe, set_max_backend,
    get_max_backend, available_tiers, select_backend,
)

__all__ = [
    "TIERS", "DeviceInfo", "honor_cpu_platform_env", "probe",
    "set_max_backend", "get_max_backend", "available_tiers",
    "select_backend",
]

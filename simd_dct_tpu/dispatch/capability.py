"""Runtime capability detection and backend tiering.

The TPU analog of the reference's CPUID feature probe + ISA dispatch
(src/simd_platform.c:68-178, src/simd_dct.cpp:71-133):

    tier "pallas" ≙ AVX-512 fast path  (fused Pallas kernels, TPU only)
    tier "xla"    ≙ SSE fallback       (pure-jnp, any XLA backend)
    tier "numpy"  ≙ NoSimd golden      (scalar NumPy reference model)

Like the reference's mutable feature bools (cleared by ``--max-simd``,
src/main.cpp:283-438), the active cap is process-global mutable state via
``set_max_backend`` and can also be set per call through the api layer.
"""

from __future__ import annotations

import dataclasses
import functools

import jax

# Tier order, strongest first.
TIERS = ("pallas", "xla", "numpy")

_max_backend: str = "pallas"


@dataclasses.dataclass(frozen=True)
class DeviceInfo:
    """What CPUID told the reference, jax tells us."""
    platform: str          # 'tpu' / 'axon' / 'cpu' / ...
    device_kind: str       # e.g. 'TPU v5 lite'
    num_devices: int
    supports_pallas: bool

    @property
    def banner(self) -> str:
        return (f"{self.device_kind} x{self.num_devices} "
                f"[{self.platform}] pallas={self.supports_pallas}")


@functools.lru_cache(maxsize=1)
def _pallas_functional() -> bool:
    """Actually try compiling a trivial Pallas TPU kernel — the analog of
    the reference's CPUID+XGETBV probe (src/simd_platform.c:68-178): the
    platform may advertise a TPU while the Mosaic compile service is
    unavailable, in which case dispatch must degrade to the XLA tier."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    try:
        # Probe the op classes the kernels actually use (u8 load/store,
        # widening casts, i32 math, narrowing) — NOT u8 vector arithmetic,
        # which some libtpu builds cannot lower and which the kernels avoid.
        def k(x_ref, o_ref):
            v = x_ref[...].astype(jnp.int32) + 1
            o_ref[...] = jnp.clip(v, 0, 255).astype(jnp.uint8)
        out = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint8),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(jnp.zeros((8, 128), jnp.uint8))
        jax.block_until_ready(out)
        return True
    except Exception:
        return False


@functools.lru_cache(maxsize=1)
def probe() -> DeviceInfo:
    devs = jax.devices()
    platform = devs[0].platform if devs else "none"
    kind = devs[0].device_kind if devs else "none"
    # Pallas TPU kernels need a real TPU (the 'axon' tunnel platform exposes
    # TPU devices) AND a working Mosaic compile path; interpret mode covers
    # CPU for tests.
    is_tpu = "tpu" in kind.lower() or platform in ("tpu", "axon")
    return DeviceInfo(platform=platform, device_kind=kind,
                      num_devices=len(devs),
                      supports_pallas=is_tpu and _pallas_functional())


def honor_cpu_platform_env() -> None:
    """Honor a ``JAX_PLATFORMS=cpu`` env request in CLI entry points.

    A session sitecustomize may programmatically pin
    ``jax.config.jax_platforms`` to a remote-tunnel plugin, which
    silently outranks the env var — and a dead tunnel then hangs
    backend init, making offline runs impossible.  Only the all-cpu
    request is restored (never a remote platform: the ambient session
    env may carry the tunnel name into unrelated runs), and only while
    backends are still uninitialized."""
    import os

    env = os.environ.get("JAX_PLATFORMS", "")
    if env and set(env.split(",")) == {"cpu"}:
        from jax._src import xla_bridge
        if not xla_bridge.backends_are_initialized():
            jax.config.update("jax_platforms", "cpu")


def set_max_backend(tier: str, *, strict: bool = False) -> None:
    """Cap dispatch at a tier (≙ --max-simd).  'numpy' forces the golden.

    With ``strict=True`` the cap must name a tier that is actually
    available on this machine, matching the reference's --max-simd
    contract (src/main.cpp:283-438 validates each requested ISA level
    against the CPUID probe and errors out on an unsupported one);
    the default lenient form only caps the cascade."""
    global _max_backend
    if tier not in TIERS:
        raise ValueError(f"unknown backend tier {tier!r}; expected one of {TIERS}")
    if strict and tier not in available_tiers():
        from ..api import NotSupportedError
        raise NotSupportedError(
            f"requested backend cap {tier!r} is not supported on this "
            f"machine (available: {available_tiers()})")
    _max_backend = tier


def get_max_backend() -> str:
    return _max_backend


def available_tiers(pallas_interpret: bool = False) -> tuple[str, ...]:
    """Tiers usable right now, strongest first."""
    info = probe()
    out = []
    if info.supports_pallas or pallas_interpret:
        out.append("pallas")
    out.append("xla")
    out.append("numpy")
    return tuple(out)


def select_backend(requested: str | None = None, *,
                   pallas_interpret: bool = False) -> str:
    """Resolve the backend for a call: explicit request > global cap >
    strongest available (the reference's dispatch cascade,
    src/simd_dct.cpp:78-85)."""
    avail = available_tiers(pallas_interpret)
    if requested is not None:
        if requested not in TIERS:
            raise ValueError(
                f"unknown backend {requested!r}; expected one of {TIERS}")
        if requested not in avail:
            from ..api import NotSupportedError
            raise NotSupportedError(
                f"backend {requested!r} not available on this platform "
                f"(available: {avail})")
        return requested
    cap_idx = TIERS.index(_max_backend)
    for tier in TIERS[cap_idx:]:
        if tier in avail:
            return tier
    return "numpy"

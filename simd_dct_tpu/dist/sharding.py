"""Sharded encode/decode: strip-axis and frame-axis parallelism.

Strategy (SURVEY.md §2.6, §7.5): 8x8 blocks never cross a 16-image-row
boundary (8 rows in each of the two stacked views), so sharding the strip
axis needs NO halo exchange — each shard runs the single-chip encoder on
its local rows via ``jax.shard_map``.  The only cross-chip pattern is the
stereo planar layout, whose 64 planes are naturally strip-segmented: each
shard owns the ``W/4``-byte segment of every plane for its strips
(mirroring the reference's per-strip plane-cursor advance,
src/simd_dct.cpp:1075-1083); ``gather=True`` all-gathers the segments into
replicated planes at the end.

Frame-axis (video) parallelism shards a leading batch axis; with a
(host, chip) mesh, frames ride DCN and strips ride ICI.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels import xla_path as X
from .mesh import DATA_AXIS


def _use_pallas(mesh: Mesh, h2_local: int, w: int) -> bool:
    """Shards run the fused Pallas kernels when EVERY mesh device is a
    TPU with a working Mosaic path and chunk-aligned width (any
    H2 % 8 == 0 local strip count rides the kernels' non-dividing
    grids) — the multi-chip analog of the api tier cascade; otherwise
    the portable XLA tier (e.g. on the virtual CPU test mesh).

    The gate is decided ONCE per call, which is sound because shard_map
    traces one SPMD program that every shard executes — per-shard tier
    divergence is not expressible — and the shard geometry is uniform
    by construction (strips divide evenly, W is never sharded).  The
    one way a per-process probe could lie is a mesh mixing device
    kinds, so the platform check covers every device, not just the
    first (round-3 VERDICT weak #5)."""
    # 'axon' is a remote-TPU tunnel platform (same treatment as
    # capability.probe, dispatch/capability.py)
    if any(d.platform not in ("tpu", "axon") for d in mesh.devices.flat):
        return False
    from ..dispatch.capability import probe
    from ..kernels import pallas_dct as PK
    return probe().supports_pallas and PK.supports(h2_local * 2, w)


def _num_shards(mesh: Mesh, axis_name: str) -> int:
    return mesh.shape[axis_name]


# ---------------------------------------------------------------------------
# strip-sharded single images
# ---------------------------------------------------------------------------

def encode_quantize32_sharded(img: jax.Array, lut, mesh: Mesh, *,
                              axis_name: str = DATA_AXIS,
                              rounding: str = "rne") -> jax.Array:
    """Mode32 encode with the TOP view's strips sharded over the mesh.

    ``img`` is (H, W); each shard encodes H/2/n contiguous view rows.
    Returns records (S, 8W) sharded on the strip axis — a pure local
    computation, zero collectives (the TPU analog of handing each thread a
    ``startY/endY`` range)."""
    h, w = img.shape
    n = _num_shards(mesh, axis_name)
    assert (h // 2) % (n * 8) == 0, "strips must divide evenly over shards"
    top = img[: h // 2, :]
    lut = jnp.asarray(lut, jnp.float32)

    use_pl = _use_pallas(mesh, (h // 2) // n, w)

    def shard_fn(local, lut_r):
        if use_pl:
            from ..core.quantize import quant_scales
            from ..kernels import pallas_dct as PK
            return PK._enc32_panels(local, quant_scales(lut_r),
                                    normalize=False, rounding=rounding)
        return X.encode32_view(local, lut_r, rounding) \
            .reshape(local.shape[0] // 8, -1)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=P(axis_name, None), check_vma=False)
    return fn(top, lut)


def decode_quantize32_sharded(records: jax.Array, lut, size_x: int,
                              size_y: int, mesh: Mesh, *,
                              axis_name: str = DATA_AXIS) -> jax.Array:
    """Inverse: records (S, 8W) sharded on strips -> (H/2, W) top view
    sharded on rows."""
    lut = jnp.asarray(lut, jnp.float32)

    def shard_fn(local, lut_r):
        s_local = local.shape[0]
        if _use_pallas(mesh, s_local * 8, size_x):
            from ..core.quantize import dequant_scales
            from ..kernels import pallas_dct as PK
            return PK._dec32_panels(local, dequant_scales(lut_r),
                                    normalize=False)
        return X.decode_quantize32(local.reshape(-1), lut_r,
                                   size_x, s_local * 16)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name, None), P()),
        out_specs=P(axis_name, None), check_vma=False)
    return fn(records, lut)


def encode_quantize_stereo_sharded(img: jax.Array, lut, mesh: Mesh, *,
                                   axis_name: str = DATA_AXIS,
                                   rounding: str = "rne",
                                   gather: bool = False,
                                   view_layout: str = "interleaved"
                                   ) -> jax.Array:
    """Stereo planar encode, strips sharded; both views stay local to the
    shard that owns their strip range.

    ``view_layout='interleaved'`` returns plane segments shaped
    (64, S, W/4) with the strip axis sharded; flattening axis order
    (plane, strip, segment-byte) equals the reference byte stream.
    ``view_layout='native'`` (round 5) returns the TPU-native
    (2, 64, S, BWP) tensor, strip axis sharded — each shard's plane
    rows already sit at the 128-multiple minor dim, so the per-shard
    stores AND any later gather move at full DMA speed.
    ``gather=True`` replicates the full planes (the only collective in
    the framework — an all-gather over ICI)."""
    if view_layout not in ("interleaved", "native"):
        from ..api import InvalidParameterError
        raise InvalidParameterError(
            f"sharded stereo supports view_layout 'interleaved' or "
            f"'native', got {view_layout!r}")
    h, w = img.shape
    n = _num_shards(mesh, axis_name)
    assert (h // 2) % (n * 8) == 0
    views = img.reshape(2, h // 2, w)
    lut = jnp.asarray(lut, jnp.float32)

    use_pl = _use_pallas(mesh, (h // 2) // n, w)

    def shard_fn(local_views, lut_r):
        # local_views: (2, H2/n, W) — this shard's strip range of BOTH views.
        local = local_views.reshape(-1, w)
        s_local = local_views.shape[1] // 8
        if use_pl:
            from ..kernels import pallas_dct as PK
            out_l = PK.encode_quantize_stereo(local, lut_r, 0, 1 << 30,
                                              rounding,
                                              view_layout=view_layout)
            if view_layout == "native":
                return out_l                 # (2, 64, s_local, BWP)
            return out_l.reshape(64, s_local, w // 4)
        flat = X.encode_quantize_stereo(local, lut_r, 0, 1 << 30,
                                        rounding)
        if view_layout == "native":
            from ..kernels.pallas_dct import native_stereo_bwp
            from ..layout import reorder as _reorder
            v = _reorder.stereo_interleaved_to_views(flat, s_local, w // 8)
            pad = native_stereo_bwp(w) - w // 8
            if pad:
                v = jnp.pad(v, ((0, 0), (0, 0), (0, 0), (0, pad)),
                            constant_values=127)
            return v
        return flat.reshape(64, s_local, w // 4)

    native = view_layout == "native"
    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis_name, None), P()),
        out_specs=(P(None, None, axis_name, None) if native
                   else P(None, axis_name, None)), check_vma=False)
    out = fn(views, lut)
    if gather:
        out = jax.lax.with_sharding_constraint(
            out, NamedSharding(mesh, P()))
    return out


def decode_quantize_stereo_sharded(planes: jax.Array, lut, size_x: int,
                                   size_y: int, mesh: Mesh, *,
                                   axis_name: str = DATA_AXIS,
                                   view_layout: str = "interleaved"
                                   ) -> jax.Array:
    """Inverse: (64, S, W/4) plane segments (strip-sharded) — or the
    (2, 64, S, BWP) native tensor for ``view_layout='native'`` ->
    (H, W) image as (2, H/2, W) views stacked, rows sharded within each
    view."""
    if view_layout not in ("interleaved", "native"):
        from ..api import InvalidParameterError
        raise InvalidParameterError(
            f"sharded stereo supports view_layout 'interleaved' or "
            f"'native', got {view_layout!r}")
    lut = jnp.asarray(lut, jnp.float32)
    w = size_x
    native = view_layout == "native"

    def shard_fn(local_planes, lut_r):
        s_local = local_planes.shape[2 if native else 1]
        if native and not _use_pallas(mesh, s_local * 8, w):
            # fallback tiers consume the planar route: drop pad columns
            from ..layout import reorder as _reorder
            flat = _reorder.stereo_views_to_interleaved(
                local_planes[..., : w // 8])
            local = X.decode_quantize_stereo(flat, lut_r, w, s_local * 16)
        elif native:
            from ..kernels import pallas_dct as PK
            local = PK.decode_quantize_stereo(
                local_planes, lut_r, w, s_local * 16, view_layout="native")
        else:
            flat = local_planes.reshape(-1)
            if _use_pallas(mesh, s_local * 8, w):
                from ..kernels import pallas_dct as PK
                local = PK.decode_quantize_stereo(flat, lut_r, w,
                                                  s_local * 16)
            else:
                local = X.decode_quantize_stereo(flat, lut_r, w,
                                                 s_local * 16)
        return local.reshape(2, s_local * 8, w)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=((P(None, None, axis_name, None) if native
                   else P(None, axis_name, None)), P()),
        out_specs=P(None, axis_name, None), check_vma=False)
    views = fn(planes, lut)
    return views.reshape(size_y, size_x)



# ---------------------------------------------------------------------------
# frame-sharded batches (video workload, BASELINE config 4-5)
# ---------------------------------------------------------------------------

def encode_quantize32_batch(frames: jax.Array, lut, mesh: Mesh, *,
                            frame_axis: str = DATA_AXIS,
                            rounding: str = "rne") -> jax.Array:
    """(B, H, W) u8 frames, B sharded over the mesh -> (B, S, 8W) records.

    The per-frame encode is vmapped inside each shard; with a 2-D
    (host, chip) mesh pass ``frame_axis='host'`` and additionally shard
    strips by wrapping this in a second shard_map level."""
    lut = jnp.asarray(lut, jnp.float32)

    b, h, w = frames.shape
    use_pl = _use_pallas(mesh, h // 2, w)

    def shard_fn(local_frames, lut_r):
        def one(fr):
            if use_pl:
                from ..kernels import pallas_dct as PK
                return PK.encode_quantize32(fr, lut_r, 0, 1 << 30, rounding)
            return X.encode_quantize32(fr, lut_r, 0, 1 << 30, rounding)
        return jax.vmap(one)(local_frames)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(frame_axis, None, None), P()),
        out_specs=P(frame_axis, None), check_vma=False)
    return fn(frames, lut).reshape(b, (h // 2) // 8, 8 * w)


def encode_quantize32_batch_2d(frames: jax.Array, lut, mesh: Mesh, *,
                               frame_axis: str = "host",
                               strip_axis: str = "chip",
                               rounding: str = "rne") -> jax.Array:
    """(B, H, W) frames over a 2-D (host, chip) mesh: frames shard over
    ``frame_axis`` (DCN-friendly) and each frame's strips over
    ``strip_axis`` (ICI-friendly) — the full multi-host layout of
    BASELINE config 5.  Returns (B, S, 8W) records sharded on both axes."""
    b, h, w = frames.shape
    n_s = _num_shards(mesh, strip_axis)
    assert (h // 2) % (n_s * 8) == 0
    lut = jnp.asarray(lut, jnp.float32)
    tops = frames[:, : h // 2, :]

    use_pl = _use_pallas(mesh, (h // 2) // n_s, w)

    def shard_fn(local, lut_r):
        def one(view_part):
            if use_pl:
                from ..core.quantize import quant_scales
                from ..kernels import pallas_dct as PK
                return PK._enc32_panels(view_part, quant_scales(lut_r),
                                        normalize=False, rounding=rounding)
            return X.encode32_view(view_part, lut_r, rounding) \
                .reshape(view_part.shape[0] // 8, -1)
        return jax.vmap(one)(local)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(frame_axis, strip_axis, None), P()),
        out_specs=P(frame_axis, strip_axis, None), check_vma=False)
    return fn(tops, lut)


def roundtrip_quantize32_batch(frames: jax.Array, lut, mesh: Mesh, *,
                               frame_axis: str = DATA_AXIS) -> jax.Array:
    """Fused encode -> decode round-trip per frame (BASELINE config 4:
    batched video, frames/s per chip)."""
    lut = jnp.asarray(lut, jnp.float32)

    _, fh, fw = frames.shape
    use_pl = _use_pallas(mesh, fh // 2, fw)

    def shard_fn(local_frames, lut_r):
        def one(fr):
            h, w = fr.shape
            if use_pl:
                from ..kernels import pallas_dct as PK
                return PK.roundtrip_quantize32(fr, lut_r)
            rec = X.encode_quantize32(fr, lut_r, 0, 1 << 30, "rne")
            return X.decode_quantize32(rec, lut_r, w, h)
        return jax.vmap(one)(local_frames)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(frame_axis, None, None), P()),
        out_specs=P(frame_axis, None, None), check_vma=False)
    return fn(frames, lut)


def encode_quantize32_ycbcr_sharded(planes: jax.Array, luma, chroma,
                                    mesh: Mesh, *,
                                    axis_name: str = DATA_AXIS,
                                    rounding: str = "rne") -> jax.Array:
    """Fused YCbCr mode32 encode with the TOP view's strips sharded over
    the mesh: (3, H, W) planar RGB -> (3, S, 8W) records sharded on the
    strip axis.  Pure local computation, zero collectives (the color mix
    is per-pixel and blocks never cross a shard's 8-row boundary)."""
    _, h, w = planes.shape
    n = _num_shards(mesh, axis_name)
    assert (h // 2) % (n * 8) == 0, "strips must divide evenly over shards"
    top = planes[:, : h // 2, :]
    luma = jnp.asarray(luma, jnp.float32)
    chroma = jnp.asarray(chroma, jnp.float32)

    use_pl = _use_pallas(mesh, (h // 2) // n, w)

    def shard_fn(local, lut_l, lut_c):
        from ..kernels import color32 as C32
        if use_pl:
            return C32._enc32_rgb_panels(local, lut_l, lut_c,
                                         rounding=rounding)
        return C32.encode_ycbcr_xla(local, lut_l, lut_c, rounding=rounding)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(), P()),
        out_specs=P(None, axis_name, None), check_vma=False)
    return fn(top, luma, chroma)


def encode_quantize32_ycbcr420_sharded(planes: jax.Array, luma, chroma,
                                       mesh: Mesh, *,
                                       axis_name: str = DATA_AXIS,
                                       rounding: str = "rne"):
    """Fused YCbCr 4:2:0 encode with the TOP view's strips sharded over
    the mesh: (3, H, W) planar RGB -> ((S, 8W) luma records sharded on
    strips, (2, S/2, 4W) chroma records sharded on chroma strips).

    The 2x2 chroma fold pairs luma strips, so each shard must own an
    EVEN strip count (strips never cross a 16-row boundary; chroma
    strips never cross a 32-row boundary) — still zero collectives."""
    _, h, w = planes.shape
    n = _num_shards(mesh, axis_name)
    assert (h // 2) % (n * 16) == 0, \
        "420 sharding needs an even strip count per shard"
    top = planes[:, : h // 2, :]
    luma = jnp.asarray(luma, jnp.float32)
    chroma = jnp.asarray(chroma, jnp.float32)

    use_pl = _use_pallas(mesh, (h // 2) // n, w) and w % 256 == 0

    def shard_fn(local, lut_l, lut_c):
        from ..kernels import color420 as C420
        if use_pl:
            return C420._enc420_panels(local, lut_l, lut_c,
                                       rounding=rounding)
        return C420.encode_ycbcr420_xla(local, lut_l, lut_c,
                                        rounding=rounding)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(), P()),
        out_specs=(P(axis_name, None), P(None, axis_name, None)),
        check_vma=False)
    return fn(top, luma, chroma)


def decode_quantize32_ycbcr420_sharded(y_rec: jax.Array, c_rec: jax.Array,
                                       luma, chroma, size_x: int,
                                       size_y: int, mesh: Mesh, *,
                                       axis_name: str = DATA_AXIS) \
        -> jax.Array:
    """Inverse: strip-sharded ((S, 8W), (2, S/2, 4W)) 420 records ->
    (3, H/2, W) planar RGB sharded on rows (2x2 replication upsample
    stays shard-local: a chroma strip feeds exactly its own shard's two
    luma strips)."""
    luma = jnp.asarray(luma, jnp.float32)
    chroma = jnp.asarray(chroma, jnp.float32)
    n = _num_shards(mesh, axis_name)
    s = y_rec.shape[0]
    assert s % (2 * n) == 0

    use_pl = _use_pallas(mesh, (s // n) * 8, size_x) and size_x % 256 == 0

    def shard_fn(local_y, local_c, lut_l, lut_c):
        from ..kernels import color420 as C420
        if use_pl:
            return C420._dec420_panels(local_y, local_c, lut_l, lut_c)
        return C420.decode_ycbcr420_xla(local_y, local_c, lut_l, lut_c)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis_name, None), P(None, axis_name, None), P(), P()),
        out_specs=P(None, axis_name, None), check_vma=False)
    return fn(y_rec, c_rec, luma, chroma)


def decode_quantize32_ycbcr_sharded(records: jax.Array, luma, chroma,
                                    size_x: int, size_y: int, mesh: Mesh, *,
                                    axis_name: str = DATA_AXIS) -> jax.Array:
    """Inverse: (3, S, 8W) records sharded on strips -> (3, H/2, W)
    planar RGB sharded on rows."""
    luma = jnp.asarray(luma, jnp.float32)
    chroma = jnp.asarray(chroma, jnp.float32)

    def shard_fn(local, lut_l, lut_c):
        from ..kernels import color32 as C32
        s_local = local.shape[1]
        if _use_pallas(mesh, s_local * 8, size_x):
            return C32._dec32_rgb_panels(local, lut_l, lut_c)
        return C32.decode_ycbcr_xla(local, lut_l, lut_c)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(None, axis_name, None), P(), P()),
        out_specs=P(None, axis_name, None), check_vma=False)
    return fn(records, luma, chroma)

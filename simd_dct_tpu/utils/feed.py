"""Host->device input pipelining (SURVEY.md §5 "Distributed communication
backend": host<->device overlap via async dispatch + double-buffered
input feeding).

The reference streams frames through a malloc'd buffer on one thread
(src/main.cpp:137-177,510-530); the TPU-native equivalent keeps the chip
busy by overlapping the host->device transfer of frame k+1 with the
device compute of frame k.  JAX dispatch is asynchronous, so the overlap
needs no threads — only bounded lookahead so host memory and the device
queue stay bounded.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable, Iterator

import jax


class FrameFeeder:
    """Double-buffered frame pipeline: ``depth`` frames in flight.

    ``fn`` is a (jitted) device computation applied per frame.  ``map``
    yields results in order; at any moment up to ``depth`` transfers +
    dispatches are queued ahead of the newest completed result, so the
    device never waits on the host (and the host never buffers more than
    ``depth`` frames).
    """

    def __init__(self, fn: Callable[[Any], Any], *, depth: int = 2,
                 device=None):
        if depth < 1:
            raise ValueError("depth must be >= 1")
        self._fn = fn
        self._depth = depth
        self._device = device

    def _put(self, frame):
        if self._device is not None:
            return jax.device_put(frame, self._device)
        return jax.device_put(frame)

    def map(self, frames: Iterable[Any]) -> Iterator[Any]:
        """Apply ``fn`` over ``frames`` with pipelined transfers.

        Equivalent to ``(fn(f) for f in frames)`` but with the transfer
        and dispatch of the next ``depth`` frames enqueued before each
        result is awaited."""
        inflight: deque = deque()
        it = iter(frames)
        exhausted = False
        while True:
            while not exhausted and len(inflight) < self._depth:
                try:
                    frame = next(it)
                except StopIteration:
                    exhausted = True
                    break
                # async H2D, then async dispatch — both return
                # immediately; the device works through the queue
                inflight.append(self._fn(self._put(frame)))
            if not inflight:
                return
            out = inflight.popleft()
            jax.block_until_ready(out)
            yield out


def stream_roundtrip32(frames: Iterable[Any], lut, *, depth: int = 2,
                       device=None) -> Iterator[Any]:
    """Convenience: pipelined fused mode32 round trips over a frame
    stream (the BASELINE config-4 video workload as a streaming API)."""
    import jax.numpy as jnp
    from .. import api

    lut_d = jnp.asarray(lut)
    feeder = FrameFeeder(lambda fr: api.roundtrip_quantize32(fr, lut_d),
                         depth=depth, device=device)
    return feeder.map(frames)


def stream_encode32_compressed(frames: Iterable[Any], lut, *,
                               depth: int = 2, device=None,
                               shared_table: bool = True,
                               sparse: bool = False) -> Iterator[Any]:
    """Pipelined full codec: fused mode32 encode + on-device histogram
    per frame, overlapped with the HOST Huffman pack of the previous
    frame (the device crunches frame k+1 while the host packs frame k).

    ``shared_table=True`` builds the code table from the first frame's
    histogram and reuses it (typical video: stationary statistics); a
    frame containing a symbol absent from the shared table transparently
    rebuilds from its own histogram.

    ``sparse=True`` routes each frame through the SDS1 device
    precompaction (`entropy.compress_sparse`): the host packs only the
    significant 64-byte blocks, lifting the pack-bound sustained fps by
    ~1/kept_fraction on typical content — the reason this wrapper
    exists.  Streams decode via the same ``entropy.decompress``.
    NB ``shared_table`` does not apply on this path: each frame's kept
    blocks get their own table (kept streams are small, so the
    per-frame table build is cheap relative to the pack it replaces)."""
    import numpy as np
    import jax.numpy as jnp
    from .. import api, entropy

    lut_d = jnp.asarray(lut)

    if sparse:
        feeder = FrameFeeder(
            lambda fr: api.encode_quantize32(fr, lut_d),
            depth=depth, device=device)
        for rec in feeder.map(frames):
            yield entropy.compress_sparse(rec)
        return

    def dev(fr):
        rec = api.encode_quantize32(fr, lut_d)
        return rec, entropy._hist_jit()(rec)

    feeder = FrameFeeder(dev, depth=depth, device=device)
    lengths = None
    for rec, hist in feeder.map(frames):
        if lengths is None or not shared_table:
            lengths = entropy.build_lengths(
                np.asarray(hist).astype(np.uint64))
        rec_h = np.asarray(rec)
        try:
            yield entropy.compress(rec_h, lengths)
        except entropy.EntropyError:
            lengths = entropy.build_lengths(
                np.asarray(hist).astype(np.uint64))
            yield entropy.compress(rec_h, lengths)


def stream_decode32_compressed(blobs: Iterable[Any], lut, size_x: int,
                               size_y: int, *, depth: int = 2,
                               backend: str | None = None) -> Iterator[Any]:
    """Pipelined inverse of ``stream_encode32_compressed``: the HOST
    Huffman unpack of blob k+1 overlaps the DEVICE mode32 decode of
    blob k (device dispatches are async — each decoded frame is fetched
    only after the next blob's unpack has been issued; ``depth`` bounds
    the frames in flight).  Accepts any stream ``entropy.decompress``
    understands (plain/RLE/K-chunk/SDS1 sparse)."""
    from collections import deque

    import numpy as np
    import jax.numpy as jnp

    from .. import api, entropy

    lut_d = jnp.asarray(lut)
    pending: "deque" = deque()
    for blob in blobs:
        # host unpack; SDN1/SDS1 streams ship only their parts to the
        # device and expand there (round 5 — ~0.65x the upload bytes
        # and the host skips the full reconstruction)
        rec = entropy.decompress_to_device(blob)
        fr = api.decode_quantize32(rec, lut_d,
                                   size_x, size_y, backend=backend)
        pending.append(fr)                        # device decode in flight
        while len(pending) >= depth:
            yield np.asarray(pending.popleft())
    while pending:
        yield np.asarray(pending.popleft())

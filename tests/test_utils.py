"""Aux subsystem tests: roofline math, determinism check, backend diff."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simd_dct_tpu import utils
from simd_dct_tpu.core import default_quant_lut
from simd_dct_tpu.core import golden as G
from simd_dct_tpu.kernels import xla_path as X


def test_roofline_report():
    r = utils.RooflineReport(bytes_processed=819_000_000, seconds=1.0,
                             device_kind="TPU v5 lite")
    assert abs(r.gbps - 0.819) < 1e-9
    assert abs(r.fraction_of_roofline - 0.001) < 1e-6
    assert "HBM roofline" in str(r)
    # Unknown device kinds report an unknown roofline instead of silently
    # assuming a generation (round-1 VERDICT #10).
    assert utils.hbm_peak_gbps("TPU v99 future") is None
    unk = utils.RooflineReport(bytes_processed=1, seconds=1.0,
                               device_kind="TPU v99 future")
    assert unk.fraction_of_roofline is None
    assert "unknown roofline" in str(unk)
    # Longest-prefix: v5p != v5e, v7 known.
    assert utils.chip_spec("TPU v5p").hbm_gbps == 2765.0
    assert utils.chip_spec("TPU v5 lite").hbm_gbps == 819.0
    assert utils.chip_spec("TPU v7x somechip").bf16_tflops > 2000


def test_measure_runs():
    f = lambda x: x + 1
    rep = utils.measure(f, (jnp.zeros((8, 128)),), bytes_processed=1024,
                        runs=3, warmup=1)
    assert rep.seconds > 0 and rep.gbps > 0


def test_determinism():
    img = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (64, 128), np.uint8))
    lut = default_quant_lut(50)
    assert utils.check_deterministic(
        lambda: X.encode_quantize(img, jnp.asarray(lut)))


def test_compare_backends():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (64, 128), dtype=np.uint8)
    lut = default_quant_lut(50)
    report = utils.compare_backends({
        "xla": X.encode_quantize(jnp.asarray(img), jnp.asarray(lut)),
        "numpy": G.encode_quantize_golden(img, lut, rounding="rne",
                                          legacy_range=False),
    })
    entry = report["xla-vs-numpy"]
    assert entry["ok"], entry
    bad = utils.compare_backends({
        "a": np.zeros(64, np.uint8), "b": np.full(64, 9, np.uint8)})
    assert not bad["a-vs-b"]["ok"]


def test_interpret_kernels_context():
    """Pallas kernels run under the forced interpreter context."""
    from simd_dct_tpu.kernels import pallas_dct as PK
    from simd_dct_tpu.core import default_quant_lut
    img = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, (256, 128), np.uint8))
    lut = default_quant_lut(50) * 255.0
    with utils.interpret_kernels():
        out = np.asarray(PK.encode_quantize32(img, lut, interpret=True))
    assert out.size == 128 * 128  # top view bytes of a (256,128) image


def test_available_tiers_interpret():
    from simd_dct_tpu.dispatch import available_tiers
    tiers = available_tiers(pallas_interpret=True)
    assert tiers[0] == "pallas" and "numpy" in tiers


class TestFrameFeeder:
    def test_results_match_sequential(self):
        import jax.numpy as jnp
        from simd_dct_tpu.utils.feed import FrameFeeder
        f = jax.jit(lambda x: (x.astype(jnp.int32) * 2 + 1).sum())
        frames = [np.full((16, 16), i, np.uint8) for i in range(7)]
        got = [int(v) for v in FrameFeeder(f, depth=3).map(frames)]
        want = [int(f(fr)) for fr in frames]
        assert got == want

    def test_generator_input_and_depth1(self):
        from simd_dct_tpu.utils.feed import FrameFeeder
        f = jax.jit(lambda x: x + 1)
        gen = (np.full((8,), i, np.uint8) for i in range(3))
        outs = list(FrameFeeder(f, depth=1).map(gen))
        assert [int(o[0]) for o in outs] == [1, 2, 3]

    def test_stream_roundtrip32(self):
        from simd_dct_tpu.utils.feed import stream_roundtrip32
        from simd_dct_tpu.core import default_quant_lut
        rng = np.random.default_rng(9)
        frames = [rng.integers(0, 256, (32, 64), np.uint8) for _ in range(3)]
        lut = default_quant_lut(100) * 255.0
        outs = list(stream_roundtrip32(iter(frames), lut, depth=2))
        assert len(outs) == 3
        assert outs[0].shape == (16, 64)

    def test_stream_encode32_compressed(self):
        """Pipelined encode + entropy pack: each blob decompresses to the
        same bytes as a direct encode, with the shared table reused."""
        import simd_dct_tpu as sd
        from simd_dct_tpu import entropy as E
        from simd_dct_tpu.utils.feed import stream_encode32_compressed
        from simd_dct_tpu.core import default_quant_lut
        yy, xx = np.mgrid[0:32, 0:64]
        frames = [np.clip(128 + 50 * np.sin((xx + p) / 7), 0,
                          255).astype(np.uint8) for p in range(3)]
        lut = default_quant_lut(100) * 255.0
        blobs = list(stream_encode32_compressed(iter(frames), lut, depth=2))
        assert len(blobs) == 3
        for fr, blob in zip(frames, blobs):
            want = np.asarray(sd.encode_quantize32(fr, lut))
            np.testing.assert_array_equal(E.decompress(blob), want)
        # sparse=True (SDS1 device precompaction) is semantically
        # invisible per frame (round-4 wiring)
        sblobs = list(stream_encode32_compressed(iter(frames), lut,
                                                 depth=2, sparse=True))
        for fr, blob in zip(frames, sblobs):
            want = np.asarray(sd.encode_quantize32(fr, lut))
            np.testing.assert_array_equal(E.decompress(blob), want)

    def test_stream_decode32_compressed(self):
        """Streaming inverse: blobs -> frames equals per-blob direct
        decode, any payload format incl. sparse (round-4 wiring)."""
        import simd_dct_tpu as sd
        from simd_dct_tpu import entropy as E
        from simd_dct_tpu.utils.feed import (stream_encode32_compressed,
                                             stream_decode32_compressed)
        from simd_dct_tpu.core import default_quant_lut
        yy, xx = np.mgrid[0:32, 0:64]
        frames = [np.clip(128 + 50 * np.sin((xx + p) / 7), 0,
                          255).astype(np.uint8) for p in range(3)]
        lut = default_quant_lut(100) * 255.0
        for kw in ({}, {"sparse": True}):
            blobs = list(stream_encode32_compressed(iter(frames), lut,
                                                    depth=2, **kw))
            outs = list(stream_decode32_compressed(iter(blobs), lut,
                                                   64, 32, depth=2))
            assert len(outs) == 3
            for blob, out in zip(blobs, outs):
                ref = np.asarray(sd.decode_quantize32(
                    E.decompress(blob), lut, 64, 32))
                np.testing.assert_array_equal(out, ref)

    def test_stream_compressed_table_rebuild(self):
        """A frame with symbols absent from the shared table rebuilds
        transparently instead of failing."""
        from simd_dct_tpu import entropy as E
        from simd_dct_tpu.utils.feed import stream_encode32_compressed
        from simd_dct_tpu.core import default_quant_lut
        flat = np.full((32, 64), 127, np.uint8)        # near-empty spectrum
        noisy = np.random.default_rng(1).integers(
            0, 256, (32, 64), np.uint8)                 # rich spectrum
        lut = default_quant_lut(100) * 255.0
        blobs = list(stream_encode32_compressed(iter([flat, noisy]), lut))
        assert len(blobs) == 2
        assert E.decompress(blobs[1]).size == 16 * 64

    def test_bad_depth(self):
        from simd_dct_tpu.utils.feed import FrameFeeder
        with pytest.raises(ValueError):
            FrameFeeder(lambda x: x, depth=0)

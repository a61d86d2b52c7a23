"""Self-describing .sdt container: header parse, per-mode roundtrips,
corrupt-input rejection, module CLI."""

import zlib

import numpy as np
import pytest

import simd_dct_tpu as sd
from simd_dct_tpu import api, container as C


def _img(h=64, w=128, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.clip(128 + 60 * np.sin((xx + seed) / 11) * np.cos(yy / 7),
                   0, 255).astype(np.uint8)


class TestRoundtrip:
    @pytest.mark.parametrize("mode", C.MODES)
    @pytest.mark.parametrize("compress", [False, True])
    def test_mode_roundtrip_matches_direct_decode(self, mode, compress):
        """decode(encode(img)) must equal the direct api decode of the
        direct api encode — the container adds framing, not semantics."""
        h, w = 64, 128
        src = _img(h, w)
        planes = np.stack([_img(h, w, s) for s in range(3)])
        image = planes if mode.startswith("enc-quant32-ycbcr") else src
        blob = C.encode(image, mode, quality=50.0, compress=compress)
        got = np.asarray(C.decode(blob))

        lut = sd.default_quant_lut(50.0)
        if mode == "enc-quant":
            rec = api.encode_quantize(src, lut)
            ref = api.decode_quantize(rec, lut, w, h)
        elif mode == "enc-quant-pair":
            rec = api.encode_quantize(src, lut, layout="pair")
            ref = api.decode_quantize(rec, lut, w, h, layout="pair")
        elif mode == "enc-quant32":
            rec = api.encode_quantize32(src, lut * 255.0)
            ref = api.decode_quantize32(rec, lut * 255.0, w, h)
        elif mode == "enc-quant-stereo":
            rec = api.encode_quantize_stereo(src, lut)
            ref = api.decode_quantize_stereo(rec, lut, w, h)
        else:
            from simd_dct_tpu.layout.color import BASE_CHROMA_QUANT_TABLE
            chroma = (BASE_CHROMA_QUANT_TABLE * 50.0 * 255.0)
            if mode.endswith("420"):
                rec = api.encode_quantize32_ycbcr420(planes, lut * 255.0,
                                                     chroma)
                ref = api.decode_quantize32_ycbcr420(rec, lut * 255.0,
                                                     chroma, w, h)
            else:
                rec = api.encode_quantize32_ycbcr(planes, lut * 255.0,
                                                  chroma)
                ref = api.decode_quantize32_ycbcr(rec, lut * 255.0, chroma,
                                                  w, h)
        np.testing.assert_array_equal(got, np.asarray(ref))

    def test_rle_payload(self):
        blob = C.encode(_img(), "enc-quant32", quality=50.0, rle=True)
        m = C.info(blob)
        assert m.packed
        payload, _ = C.unpack(blob)
        assert payload[:4].tobytes() == b"SDER"
        assert np.asarray(C.decode(blob)).shape == (32, 128)

    def test_bytes_blob(self):
        """A container read back from disk arrives as `bytes`; decode,
        info and the video parser must accept it (regression: the
        np.asarray 0-d S-scalar trap raised an opaque ValueError)."""
        blob = C.encode(_img(), "enc-quant32", quality=50.0, compress=True)
        raw = np.asarray(blob).tobytes()
        np.testing.assert_array_equal(C.decode(raw), C.decode(blob))
        assert C.info(raw).mode == "enc-quant32"
        frames = np.stack([_img(seed=s) for s in range(2)])
        vblob = C.encode_video(frames, "enc-quant32", quality=50.0)
        vraw = np.asarray(vblob).tobytes()
        np.testing.assert_array_equal(C.decode_video(vraw),
                                      C.decode_video(vblob))

    def test_luts_travel_exactly(self):
        """The decoder uses the stored f32 LUT verbatim — an uncommon
        quality must roundtrip through the header bit-exactly."""
        blob = C.encode(_img(), "enc-quant32", quality=37.5)
        m = C.info(blob)
        np.testing.assert_array_equal(
            m.luma_lut,
            (sd.default_quant_lut(37.5) * np.float32(255.0))
            .astype(np.float32))

    def test_strip_range_recorded(self):
        blob = C.encode(_img(), "enc-quant32", quality=50.0,
                        start_y=8, end_y=24)
        m = C.info(blob)
        assert (m.start_y, m.end_y) == (8, 24)


class TestValidation:
    def test_bad_magic(self):
        blob = C.encode(_img(), "enc-quant32", quality=50.0).copy()
        blob[0] ^= 0xFF
        with pytest.raises(C.ContainerError):
            C.unpack(blob)

    def test_bad_version(self):
        blob = C.encode(_img(), "enc-quant32", quality=50.0).copy()
        blob[4] = 99
        with pytest.raises(C.ContainerError):
            C.unpack(blob)

    def test_truncated(self):
        blob = C.encode(_img(), "enc-quant32", quality=50.0)
        for cut in (3, 10, 40, blob.size - 5):
            with pytest.raises(C.ContainerError):
                C.unpack(blob[:cut])

    def test_payload_size_mismatch(self):
        blob = C.encode(_img(), "enc-quant32", quality=50.0).copy()
        # grow the declared payload size past the blob
        pos = C._FIXED.size + 256
        blob[pos:pos + 8] = np.frombuffer(
            np.uint64(2**40).tobytes(), np.uint8)
        with pytest.raises(C.ContainerError):
            C.unpack(blob)

    def test_header_fuzz_never_crashes(self):
        rng = np.random.default_rng(0xC0DE)
        base = C.encode(_img(), "enc-quant32", quality=50.0)
        for trial in range(200):
            blob = base.copy()
            if trial % 2:
                idx = rng.integers(0, min(blob.size, 600), 6)
                blob[idx] ^= rng.integers(1, 256, 6).astype(np.uint8)
            else:
                blob = blob[: int(rng.integers(0, blob.size))].copy()
            try:
                C.decode(blob)
            except Exception as e:
                # typed errors only — never segfaults/unbounded allocs
                from simd_dct_tpu.entropy import EntropyError
                from simd_dct_tpu.api import SimdDctError
                assert isinstance(
                    e, (C.ContainerError, EntropyError, SimdDctError,
                        ValueError, TypeError)), type(e)

    def test_unknown_mode_rejected_on_encode(self):
        with pytest.raises(C.ContainerError):
            C.encode(_img(), "enc-quant64")


class TestCli:
    def test_info_and_decode(self, tmp_path, capsys):
        f = tmp_path / "frame.sdt"
        C.encode(_img(), "enc-quant32", quality=50.0).tofile(str(f))
        assert C._main(["info", str(f)]) == 0
        out = capsys.readouterr().out
        assert "mode=enc-quant32" in out and "size=128x64" in out
        g = tmp_path / "out.raw"
        assert C._main(["decode", str(f), str(g)]) == 0
        got = np.fromfile(str(g), np.uint8).reshape(32, 128)
        lut = sd.default_quant_lut(50.0) * 255.0
        ref = api.decode_quantize32(
            api.encode_quantize32(_img(), lut), lut, 128, 64)
        np.testing.assert_array_equal(got, np.asarray(ref))


class TestVideo:
    @pytest.mark.parametrize("mode", C.MODES)
    @pytest.mark.parametrize("compress", [False, True])
    def test_video_roundtrip_matches_per_frame(self, mode, compress):
        """decode_video(encode_video(frames)) equals per-frame container
        decode — batching adds no semantics."""
        h, w = 64, 128
        b = 3
        if mode.startswith("enc-quant32-ycbcr"):
            frames = np.stack([np.stack([_img(h, w, 3 * i + c)
                                         for c in range(3)])
                               for i in range(b)])
        else:
            frames = np.stack([_img(h, w, i) for i in range(b)])
        blob = C.encode_video(frames, mode, quality=50.0,
                              compress=compress)
        got = np.asarray(C.decode_video(blob))
        assert got.shape[0] == b
        for i in range(b):
            single = C.encode(frames[i], mode, quality=50.0,
                              compress=False)
            ref = np.asarray(C.decode(single))
            np.testing.assert_array_equal(got[i], ref)
            one = np.asarray(C.decode_video_frame(blob, i))
            np.testing.assert_array_equal(one, ref)

    def test_video_info_and_bounds(self):
        frames = np.stack([_img(64, 128, i) for i in range(4)])
        blob = C.encode_video(frames, "enc-quant32", quality=50.0)
        m = C.video_info(blob)
        assert (m.mode, m.size_x, m.size_y, m.n_frames, m.packed) == (
            "enc-quant32", 128, 64, 4, True)
        with pytest.raises(C.ContainerError):
            C.decode_video_frame(blob, 4)
        with pytest.raises(C.ContainerError):
            C.decode_video_frame(blob, -1)

    def test_video_rle_payloads(self):
        frames = np.stack([_img(64, 128, i) for i in range(2)])
        blob = C.encode_video(frames, "enc-quant32", quality=50.0,
                              rle=True)
        got = np.asarray(C.decode_video(blob))
        ref = np.asarray(C.decode_video(
            C.encode_video(frames, "enc-quant32", quality=50.0,
                           compress=False)))
        np.testing.assert_array_equal(got, ref)

    def test_sparse_payloads_frame_and_video(self):
        """sparse=True (device SDS1 precompaction) must be semantically
        invisible: identical decodes for frames and video, including
        per-frame random access (round-4 wiring)."""
        frames = np.stack([_img(64, 128, i) for i in range(2)])
        ref = np.asarray(C.decode_video(
            C.encode_video(frames, "enc-quant32", quality=50.0,
                           compress=False)))
        vb = C.encode_video(frames, "enc-quant32", quality=50.0,
                            sparse=True)
        np.testing.assert_array_equal(np.asarray(C.decode_video(vb)), ref)
        np.testing.assert_array_equal(
            np.asarray(C.decode_video_frame(vb, 1)), ref[1])
        fb = C.encode(frames[0], "enc-quant32", quality=50.0, sparse=True)
        np.testing.assert_array_equal(np.asarray(C.decode(fb)), ref[0])
        # cross-feature: stereo planar layout x sparse payloads
        sref = np.asarray(C.decode_video(C.encode_video(
            frames, "enc-quant-stereo", quality=50.0, compress=False,
            view_layout="planar")))
        svb = C.encode_video(frames, "enc-quant-stereo", quality=50.0,
                             sparse=True, view_layout="planar")
        np.testing.assert_array_equal(np.asarray(C.decode_video(svb)), sref)
        np.testing.assert_array_equal(
            np.asarray(C.decode_video_frame(svb, 1)), sref[1])

    def test_video_shared_table_beats_or_matches_sizes(self):
        """Compressed video payloads stay decodable and the shared table
        is built once (smoke: ratio sane on smooth frames)."""
        frames = np.stack([_img(64, 128, i) for i in range(8)])
        blob = C.encode_video(frames, "enc-quant32", quality=50.0)
        raw = C.encode_video(frames, "enc-quant32", quality=50.0,
                             compress=False)
        assert blob.size < raw.size

    def test_video_header_fuzz_never_crashes(self):
        rng = np.random.default_rng(0xBEEF)
        frames = np.stack([_img(64, 128, i) for i in range(2)])
        base = C.encode_video(frames, "enc-quant32", quality=50.0)
        from simd_dct_tpu.entropy import EntropyError
        from simd_dct_tpu.api import SimdDctError
        for trial in range(150):
            blob = base.copy()
            if trial % 2:
                idx = rng.integers(0, min(blob.size, 600), 6)
                blob[idx] ^= rng.integers(1, 256, 6).astype(np.uint8)
            else:
                blob = blob[: int(rng.integers(0, blob.size))].copy()
            try:
                C.decode_video(blob)
            except (C.ContainerError, EntropyError, SimdDctError,
                    ValueError, TypeError):
                pass

    def test_video_wrong_ndim_rejected(self):
        with pytest.raises(C.ContainerError):
            C.encode_video(_img(), "enc-quant32")

    def test_video_cli_info_decode(self, tmp_path, capsys):
        frames = np.stack([_img(64, 128, i) for i in range(2)])
        f = tmp_path / "clip.sdtv"
        C.encode_video(frames, "enc-quant32", quality=50.0).tofile(str(f))
        assert C._main(["info", str(f)]) == 0
        assert "frames=2" in capsys.readouterr().out
        g = tmp_path / "clip.raw"
        assert C._main(["decode", str(f), str(g)]) == 0
        got = np.fromfile(str(g), np.uint8).reshape(2, 32, 128)
        ref = np.asarray(C.decode_video(C.encode_video(
            frames, "enc-quant32", quality=50.0, compress=False)))
        np.testing.assert_array_equal(got, ref)

    def test_zero_frames_rejected(self):
        frames = np.stack([_img(64, 128, i) for i in range(2)])
        blob = C.encode_video(frames, "enc-quant32", quality=50.0).copy()
        blob[16:20] = np.frombuffer(np.uint32(0).tobytes(), np.uint8)
        with pytest.raises(C.ContainerError):
            C.decode_video(blob)
        with pytest.raises(C.ContainerError):
            C.encode_video(frames[:0], "enc-quant32", quality=50.0)

    def test_ycbcr_strip_range_rejected(self):
        """The color pipeline has no strip-range form; a header recording
        an unapplied range would lie to consumers."""
        planes = np.stack([_img(64, 128, s) for s in range(3)])
        with pytest.raises(C.ContainerError):
            C.encode(planes, "enc-quant32-ycbcr", quality=50.0,
                     start_y=8, end_y=24)


class TestDeepFuzz:
    """Round 4 (VERDICT #7): ~1k mutations across the WHOLE blob (headers
    AND payloads), truncations, splices, and random garbage — every
    failure must be a typed error; successful decodes of mutants are
    fine (garbage pixels), but never crashes or unbounded allocations."""

    TYPED = None

    @classmethod
    def _typed(cls):
        if cls.TYPED is None:
            from simd_dct_tpu.entropy import EntropyError
            from simd_dct_tpu.api import SimdDctError
            cls.TYPED = (C.ContainerError, EntropyError, SimdDctError,
                         ValueError, TypeError)
        return cls.TYPED

    def _hammer(self, base, decode, rng, trials):
        typed = self._typed()
        for trial in range(trials):
            kind = trial % 4
            if kind == 0:        # bit flips ANYWHERE (payload included)
                blob = base.copy()
                idx = rng.integers(0, blob.size, 8)
                blob[idx] ^= rng.integers(1, 256, 8).astype(np.uint8)
            elif kind == 1:      # truncation at any point
                blob = base[: int(rng.integers(0, base.size))].copy()
            elif kind == 2:      # splice: swap two random spans
                blob = base.copy()
                a, b = sorted(rng.integers(0, blob.size, 2))
                ln = int(min(rng.integers(1, 64), blob.size - b))
                blob[a:a + ln], blob[b:b + ln] = \
                    blob[b:b + ln].copy(), blob[a:a + ln].copy()
            else:                # random garbage with a valid-ish prefix
                blob = np.concatenate([
                    base[: int(rng.integers(0, 64))],
                    rng.integers(0, 256, int(rng.integers(0, 256)),
                                 dtype=np.uint8).astype(np.uint8)])
            try:
                decode(np.ascontiguousarray(blob))
            except typed:
                pass

    @pytest.mark.parametrize("mode,comp", [
        ("enc-quant32", True), ("enc-quant", False),
        ("enc-quant-stereo", True)])
    def test_frame_fuzz(self, mode, comp):
        rng = np.random.default_rng(zlib.crc32(mode.encode()))
        base = C.encode(_img(), mode, quality=50.0, compress=comp)
        self._hammer(base, C.decode, rng, 250)

    def test_video_fuzz(self):
        rng = np.random.default_rng(0xF00D)
        frames = np.stack([_img(64, 128, i) for i in range(3)])
        base = C.encode_video(frames, "enc-quant32", quality=50.0)
        self._hammer(base, C.decode_video, rng, 250)
        # per-frame random access on mutants, incl. out-of-range indices
        typed = self._typed() + (IndexError,)
        for trial in range(100):
            blob = base.copy()
            idx = rng.integers(0, blob.size, 8)
            blob[idx] ^= rng.integers(1, 256, 8).astype(np.uint8)
            try:
                C.decode_video_frame(np.ascontiguousarray(blob),
                                     int(rng.integers(-2, 6)))
            except typed:
                pass

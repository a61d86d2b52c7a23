"""Entropy-coding stage: native canonical Huffman + on-device histogram.

North-star extension beyond the reference (which stops at quantized
bytes); the roundtrip contract is EXACT byte recovery."""

import numpy as np
import pytest

import simd_dct_tpu as sd
from simd_dct_tpu import entropy as E


class TestRoundtrip:
    @pytest.mark.parametrize("case", [
        "random", "skewed", "constant", "single", "two_symbols", "all256",
    ])
    def test_exact(self, case):
        rng = np.random.default_rng(9)
        data = {
            "random": rng.integers(0, 256, 100_000, dtype=np.uint8),
            "skewed": rng.choice(
                np.arange(256, dtype=np.uint8), 200_000,
                p=np.r_[0.9, np.full(255, 0.1 / 255)]),
            "constant": np.full(5_000, 127, np.uint8),
            "single": np.asarray([42], np.uint8),
            "two_symbols": np.tile(
                np.asarray([0, 255], np.uint8), 1_000),
            "all256": np.arange(256, dtype=np.uint8),
        }[case]
        blob = E.compress(data, stored_ok=False)
        back = E.decompress(blob)
        np.testing.assert_array_equal(back, data)

    @pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 1000, 100_003])
    def test_all_formats_exact(self, n):
        """Single-, 4-stream, and generalized K-chunk formats roundtrip
        exactly at awkward lengths (chunk boundaries, sub-chunk inputs,
        K > n leaving empty chunks, K not a multiple of 4)."""
        rng = np.random.default_rng(n)
        data = rng.integers(0, 256, n, dtype=np.uint8)
        for streams in (1, 4, 3, 16, 31, 128):
            blob = E.compress(data, streams=streams, stored_ok=False)
            np.testing.assert_array_equal(E.decompress(blob), data)

    @pytest.mark.parametrize("dist", ["geometric", "uniform", "skew15"])
    def test_pair_lut_decode_distributions(self, dist):
        """The pair-LUT decoder (two symbols per 15-bit window lookup)
        must stay exact across code-length regimes: geometric tails
        force 15-bit-limited codes (pairs never fit), uniform gives all
        8-bit codes (pairs always fit), extreme skew mixes 1-bit codes
        with long ones (pair-hit rate varies per window)."""
        rng = np.random.default_rng(11)
        n = 1 << 21   # above every threading threshold
        data = {
            "geometric": np.minimum(
                rng.geometric(0.35, n) - 1, 255).astype(np.uint8),
            "uniform": rng.integers(0, 256, n, dtype=np.uint8),
            "skew15": rng.choice(
                np.arange(64, dtype=np.uint8), n,
                p=np.r_[0.97, np.full(63, 0.03 / 63)]),
        }[dist]
        for streams in (1, 4, 16):
            blob = E.compress(data, streams=streams, stored_ok=False)
            np.testing.assert_array_equal(E.decompress(blob), data)

    def test_g_format_magic_and_threaded_size(self):
        """>=1 MB inputs exercise the threaded quartet decode path."""
        rng = np.random.default_rng(5)
        data = rng.integers(0, 256, (1 << 20) + 17, dtype=np.uint8)
        blob = E.compress(data, streams=16, stored_ok=False)
        assert blob[:4].tobytes() == b"SDEG"
        assert int(blob[12]) == 16
        np.testing.assert_array_equal(E.decompress(blob), data)

    def test_four_stream_is_default_and_decodes(self):
        rng = np.random.default_rng(0)
        data = rng.integers(0, 64, 10_000, dtype=np.uint8)
        blob = E.compress(data)
        assert blob[:4].tobytes() == b"SDE4"
        np.testing.assert_array_equal(E.decompress(blob), data)

    def test_empty(self):
        with pytest.raises(E.EntropyError):
            E.compress(np.zeros(0, np.uint8))

    def test_truncated_stream_rejected(self):
        with pytest.raises(E.EntropyError):
            E.decompress(np.zeros(10, np.uint8))

    def test_bad_magic_rejected(self):
        blob = E.compress(np.full(100, 7, np.uint8)).copy()
        blob[0] ^= 0xFF
        with pytest.raises(E.EntropyError):
            E.decompress(blob)

    def test_bytes_input(self):
        """A `bytes` blob (stream read back from disk) must decompress
        identically to the array form, and corrupt bytes must raise the
        typed error (np.asarray(b"..") is a 0-d S-scalar trap)."""
        data = np.tile(np.arange(256, dtype=np.uint8), 64)
        blob = E.compress_records(data)
        raw = np.asarray(blob).tobytes()
        np.testing.assert_array_equal(E.decompress(raw), data)
        np.testing.assert_array_equal(E.decompress(bytearray(raw)), data)
        # compress side accepts bytes too
        np.testing.assert_array_equal(
            E.decompress(E.compress_records(data.tobytes())), data)
        bad = bytearray(raw)
        bad[0] ^= 0xFF
        with pytest.raises(E.EntropyError):
            E.decompress(bytes(bad))

    def test_wrapping_chunk_sizes_rejected(self):
        """Corrupted 4-stream chunk sizes whose u64 sum wraps below the
        input size must be rejected, not drive out-of-bounds reads."""
        rng = np.random.default_rng(3)
        blob = E.compress(rng.integers(0, 256, 10_000, np.uint8),
                          stored_ok=False).copy()
        comp = np.frombuffer(blob[12:44].tobytes(), np.uint64).copy()
        comp[0] = np.uint64(2**64 - 50)
        comp[1] = np.uint64(50 + int(comp[1]))
        blob[12:44] = np.frombuffer(comp.tobytes(), np.uint8)
        with pytest.raises(E.EntropyError):
            E.decompress(blob)

    def test_implausible_symbol_count_rejected(self):
        """A corrupted n_symbols header must be rejected before the
        output allocation (Huffman emits >= 1 bit/symbol)."""
        blob = E.compress(np.full(100, 7, np.uint8)).copy()
        blob[4:12] = np.frombuffer(
            np.uint64(10**12).tobytes(), np.uint8)
        with pytest.raises(E.EntropyError):
            E.decompress(blob)

    @pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 255, 256, 257, 1000,
                                   100_003])
    def test_rle_format_exact(self, n):
        """RLE format roundtrips exactly at awkward lengths, including
        run boundaries (255-byte max run, chunk splits)."""
        rng = np.random.default_rng(n)
        data = rng.choice(np.arange(256, dtype=np.uint8), n,
                          p=np.r_[np.full(255, 0.2 / 255), 0.8])
        blob = E.compress(data, rle=True, stored_ok=False)
        assert blob[:4].tobytes() == b"SDER"
        np.testing.assert_array_equal(E.decompress(blob), data)

    def test_rle_long_runs_and_all_equal(self):
        for data in (np.full(100_000, 127, np.uint8),
                     np.full(3, 0, np.uint8),
                     np.r_[np.full(300, 9, np.uint8),
                           np.arange(256, dtype=np.uint8)]):
            blob = E.compress(data, rle=True, stored_ok=False)
            np.testing.assert_array_equal(E.decompress(blob), data)

    def test_rle_beats_plain_on_records(self):
        """On quantized DCT records (zero coefficient dominates in runs)
        the RLE format compresses markedly better than plain order-0."""
        import simd_dct_tpu as sd
        h, w = 128, 256
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(128 + 60 * np.sin(xx / 17) * np.cos(yy / 13),
                      0, 255).astype(np.uint8)
        lut = sd.default_quant_lut(50) * 255.0
        rec = np.asarray(sd.encode_quantize32(img, lut))
        plain = E.compress(rec)
        rle = E.compress(rec, rle=True)
        np.testing.assert_array_equal(E.decompress(rle), rec)
        assert rle.size < plain.size * 0.75, (rle.size, plain.size)

    def test_rle_fuzz_never_crashes(self):
        rng = np.random.default_rng(0xA11)
        base = E.compress(rng.choice(
            np.arange(256, dtype=np.uint8), 4096,
            p=np.r_[np.full(255, 0.2 / 255), 0.8]), rle=True)
        for trial in range(150):
            blob = base.copy()
            kind = trial % 3
            if kind == 0:
                idx = rng.integers(0, blob.size, 8)
                blob[idx] ^= rng.integers(1, 256, 8).astype(np.uint8)
            elif kind == 1:
                blob = blob[: int(rng.integers(12, blob.size))].copy()
            else:
                blob[16:48] = rng.integers(0, 256, 32, dtype=np.uint8)
            try:
                out = E.decompress(blob)
                assert out.dtype == np.uint8
            except E.EntropyError:
                pass

    def test_fuzz_corrupted_streams_never_crash(self):
        """decompress on corrupted/garbage input must either raise
        EntropyError or return bytes — never crash or read OOB (the
        native decoder parses untrusted headers and payloads)."""
        rng = np.random.default_rng(0xF422)
        base = E.compress(rng.integers(0, 256, 4096, np.uint8))
        for trial in range(200):
            blob = base.copy()
            kind = trial % 4
            if kind == 0:      # flip random bytes (header + payload)
                idx = rng.integers(0, blob.size, 8)
                blob[idx] ^= rng.integers(1, 256, 8).astype(np.uint8)
            elif kind == 1:    # truncate
                blob = blob[: int(rng.integers(12, blob.size))].copy()
            elif kind == 2:    # pure garbage with a valid magic
                blob = rng.integers(0, 256, 400, dtype=np.uint8)
                blob[:4] = np.frombuffer(b"SDE4", np.uint8)
            else:              # scramble the chunk-size table
                blob[12:44] = rng.integers(0, 256, 32, dtype=np.uint8)
            try:
                out = E.decompress(blob)
                assert out.dtype == np.uint8   # decoded garbage is fine
            except E.EntropyError:
                pass

    def test_g_fuzz_corrupted_streams_never_crash(self):
        """The K-chunk decoder parses an untrusted chunk count and size
        table; corruption must raise EntropyError, never crash."""
        rng = np.random.default_rng(0xF423)
        base = E.compress(rng.integers(0, 256, 4096, np.uint8), streams=16,
                          stored_ok=False)
        assert base[:4].tobytes() == b"SDEG"
        for trial in range(200):
            blob = base.copy()
            kind = trial % 5
            if kind == 0:      # flip random bytes
                idx = rng.integers(0, blob.size, 8)
                blob[idx] ^= rng.integers(1, 256, 8).astype(np.uint8)
            elif kind == 1:    # truncate
                blob = blob[: int(rng.integers(12, blob.size))].copy()
            elif kind == 2:    # garbage with a valid magic
                blob = rng.integers(0, 256, 400, dtype=np.uint8)
                blob[:4] = np.frombuffer(b"SDEG", np.uint8)
            elif kind == 3:    # scramble the chunk-size table
                blob[16:16 + 8 * 16] = rng.integers(
                    0, 256, 8 * 16, dtype=np.uint8)
            else:              # corrupt the chunk count
                blob[12] = rng.integers(0, 256)
            try:
                out = E.decompress(blob)
                assert out.dtype == np.uint8
            except E.EntropyError:
                pass

    def test_compress_returns_owned_buffer(self):
        """compress must not return a view pinning the bound-sized
        scratch (~1.9x raw) alive."""
        blob = E.compress(np.full(100_000, 7, np.uint8))
        assert blob.base is None or blob.base.nbytes == blob.nbytes


class TestTables:
    def test_skewed_beats_uniform_lengths(self):
        """The most frequent symbol gets the shortest code."""
        hist = np.ones(256, np.uint64)
        hist[127] = 1_000_000
        lengths = E.build_lengths(hist)
        assert lengths[127] == lengths.min()
        assert lengths.max() <= 15

    def test_length_limit_on_pathological_histogram(self):
        """Fibonacci-ish frequencies force deep trees; lengths must be
        folded to <= 15 with a valid Kraft sum."""
        hist = np.zeros(256, np.uint64)
        a, b = 1, 1
        for i in range(40):
            hist[i] = a
            a, b = b, a + b
        lengths = E.build_lengths(hist)
        assert lengths.max() <= 15
        kraft = sum(2.0 ** -int(l) for l in lengths if l)
        assert kraft <= 1.0 + 1e-12
        # still decodes exactly
        rng = np.random.default_rng(1)
        data = rng.choice(np.arange(40, dtype=np.uint8), 50_000,
                          p=hist[:40] / hist[:40].sum())
        np.testing.assert_array_equal(
            E.decompress(E.compress(data, lengths)), data)

    def test_symbol_without_code_rejected(self):
        lengths = E.build_lengths(
            np.r_[np.ones(2, np.uint64), np.zeros(254, np.uint64)])
        with pytest.raises(E.EntropyError):
            E.compress(np.asarray([200], np.uint8), lengths)


class TestHistogram:
    def test_device_matches_host(self):
        rng = np.random.default_rng(2)
        data = rng.integers(0, 256, 65_536, dtype=np.uint8)
        dev = E.histogram(data, device=True)
        host = E.histogram(data, device=False)
        ref = np.bincount(data, minlength=256).astype(np.uint64)
        np.testing.assert_array_equal(dev, ref)
        np.testing.assert_array_equal(host, ref)


class TestPipeline:
    def test_quantized_records_compress_and_recover(self):
        """encode -> compress -> decompress -> decode equals
        encode -> decode, and smooth content compresses well."""
        h, w = 128, 256
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(128 + 60 * np.sin(xx / 17) * np.cos(yy / 13),
                      0, 255).astype(np.uint8)
        lut = sd.default_quant_lut(50) * 255.0
        rec = np.asarray(sd.encode_quantize32(img, lut))
        blob = E.compress(rec, E.build_lengths(E.histogram(rec)))
        back = E.decompress(blob)
        np.testing.assert_array_equal(back, rec)
        ratio = rec.size / blob.size
        assert ratio > 2.0, f"expected >2x on smooth content, got {ratio:.2f}"

    def test_end_to_end_helpers(self):
        h, w = 64, 128
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.clip(128 + 50 * np.sin(xx / 9), 0, 255).astype(np.uint8)
        lut = sd.default_quant_lut(100) * 255.0
        blob = E.encode_quantize32_compressed(img, lut)
        dec = E.decode_quantize32_compressed(blob, lut, w, h)
        ref = sd.decode_quantize32(
            np.asarray(sd.encode_quantize32(img, lut)), lut, w, h)
        np.testing.assert_array_equal(np.asarray(dec), np.asarray(ref))

    def test_shared_table_across_frames(self):
        """A table built from one frame's histogram decodes other frames
        with the same statistics (the multi-frame video workflow)."""
        rng = np.random.default_rng(4)
        lut = sd.default_quant_lut(50) * 255.0
        frames = [np.clip(128 + 60 * np.sin(
            (np.mgrid[0:64, 0:128][1] + p) / 11), 0, 255).astype(np.uint8)
            for p in (0, 3)]
        recs = [np.asarray(sd.encode_quantize32(f, lut)) for f in frames]
        hist = E.histogram(recs[0]) + E.histogram(recs[1])
        lengths = E.build_lengths(hist)
        for rec in recs:
            np.testing.assert_array_equal(
                E.decompress(E.compress(rec, lengths)), rec)


class TestGeneralizedRle:
    def test_rle_g_magic_and_threaded_roundtrip(self):
        """>=1 MB rle inputs take the K-chunk SDGR format (threads x
        4-chain ILP decode); exact recovery across run/literal mixes."""
        rng = np.random.default_rng(11)
        data = np.full((1 << 20) + 7, 127, np.uint8)
        idx = rng.integers(0, data.size, data.size // 8)
        data[idx] = rng.integers(0, 256, idx.size).astype(np.uint8)
        blob = E.compress(data, rle=True)
        assert blob[:4].tobytes() == b"SDGR"
        np.testing.assert_array_equal(E.decompress(blob), data)

    def test_rle_g_all_runs_and_all_literals(self):
        for data in (np.full((1 << 20) + 3, 9, np.uint8),
                     np.tile(np.arange(256, dtype=np.uint8), 4097)):
            blob = E.compress(data, rle=True, stored_ok=False)
            assert blob[:4].tobytes() == b"SDGR"
            np.testing.assert_array_equal(E.decompress(blob), data)

    def test_rle_g_fuzz_never_crashes(self):
        rng = np.random.default_rng(0xF424)
        data = np.full(1 << 20, 127, np.uint8)
        data[rng.integers(0, data.size, 1000)] = 3
        base = E.compress(data, rle=True)
        assert base[:4].tobytes() == b"SDGR"
        for trial in range(120):
            blob = base.copy()
            kind = trial % 5
            if kind == 0:
                idx = rng.integers(0, blob.size, 8)
                blob[idx] ^= rng.integers(1, 256, 8).astype(np.uint8)
            elif kind == 1:
                blob = blob[: int(rng.integers(12, min(blob.size, 5000)))
                            ].copy()
            elif kind == 2:
                blob = rng.integers(0, 256, 800, dtype=np.uint8)
                blob[:4] = np.frombuffer(b"SDGR", np.uint8)
            elif kind == 3:
                blob[16:16 + 8 * 16] = rng.integers(
                    0, 256, 8 * 16, dtype=np.uint8)
            else:
                blob[13] = rng.integers(0, 256)   # chunk count
            try:
                out = E.decompress(blob)
                assert out.dtype == np.uint8
            except E.EntropyError:
                pass

    def test_rle_explicit_streams_honored(self):
        """compress(rle=True, streams=K) emits the K-chunk SDGR format
        with exactly K chunks (previously the argument was ignored)."""
        rng = np.random.default_rng(12)
        data = rng.choice(np.arange(256, dtype=np.uint8), 50_000,
                          p=np.r_[np.full(255, 0.2 / 255), 0.8])
        for k in (1, 4, 8, 128):
            blob = E.compress(data, rle=True, streams=k)
            assert blob[:4].tobytes() == b"SDGR"
            assert int(blob[13]) == k
            np.testing.assert_array_equal(E.decompress(blob), data)
        with pytest.raises(E.EntropyError):
            E.compress(data, rle=True, streams=0)


class TestStoredEscape:
    """SDE0 stored blocks: a compress() stream never expands by more
    than the 12-byte header (deflate/zstd stored-block analog)."""

    def test_incompressible_takes_stored(self):
        rng = np.random.default_rng(77)
        data = rng.integers(0, 256, 100_000, dtype=np.uint8)
        blob = E.compress(data)
        assert blob[:4].tobytes() == b"SDE0"
        assert blob.size == data.size + 12
        np.testing.assert_array_equal(E.decompress(blob), data)

    def test_tiny_input_takes_stored(self):
        # 1-byte input: any coded format's table alone dwarfs it
        blob = E.compress(np.asarray([42], np.uint8))
        assert blob[:4].tobytes() == b"SDE0"
        np.testing.assert_array_equal(E.decompress(blob),
                                      np.asarray([42], np.uint8))

    def test_mismatched_reused_table_bounded(self):
        """A reused per-batch table that badly mismatches a frame (the
        shared-table video path) must cost at most 12 bytes, not the
        up-to-1.87x a 15-bit-code pack could."""
        skew = np.zeros(256, np.uint64)
        skew[0] = 1 << 30
        skew[1:] = 1
        lengths = E.build_lengths(skew)
        rng = np.random.default_rng(78)
        data = rng.integers(1, 256, 65_536, dtype=np.uint8)  # never sym 0
        blob = E.compress(data, lengths)
        assert blob.size <= data.size + 12
        np.testing.assert_array_equal(E.decompress(blob), data)

    def test_rle_paths_bounded(self):
        rng = np.random.default_rng(79)
        for n in (3, 4096, (1 << 20) + 5):
            data = rng.integers(0, 256, n, dtype=np.uint8)
            blob = E.compress(data, rle=True)
            assert blob.size <= data.size + 12
            np.testing.assert_array_equal(E.decompress(blob), data)

    def test_stored_size_mismatch_rejected(self):
        blob = E.compress(np.random.default_rng(80)
                          .integers(0, 256, 1000, np.uint8))
        assert blob[:4].tobytes() == b"SDE0"
        with pytest.raises(E.EntropyError):
            E.decompress(blob[:-1])
        grown = np.r_[blob, np.zeros(1, np.uint8)]
        with pytest.raises(E.EntropyError):
            E.decompress(grown)

    def test_stored_ok_false_pins_format(self):
        rng = np.random.default_rng(81)
        data = rng.integers(0, 256, 10_000, dtype=np.uint8)
        blob = E.compress(data, streams=4, stored_ok=False)
        assert blob[:4].tobytes() == b"SDE4"
        np.testing.assert_array_equal(E.decompress(blob), data)


# -- sparse precompaction (round 4) ----------------------------------------

def _sparse_records(nblk=512, active_every=4, seed=0):
    """Synthetic mode32-like records: 1 in ``active_every`` 64-byte
    blocks carries non-127 bytes."""
    rng = np.random.default_rng(seed)
    blocks = np.full((nblk, 64), 127, np.uint8)
    act = np.arange(0, nblk, active_every)
    blocks[act] = rng.integers(100, 156, (act.size, 64), dtype=np.uint8)
    return blocks.reshape(-1)


def test_sparse_roundtrip_exact():
    rec = _sparse_records()
    blob = E.compress_sparse(rec)
    assert blob.size < rec.size // 2
    out = E.decompress(blob)
    np.testing.assert_array_equal(out, rec)
    # rle payload variant
    blob_r = E.compress_sparse(rec, rle=True)
    np.testing.assert_array_equal(E.decompress(blob_r), rec)


def test_sparse_unaligned_tail():
    rec = _sparse_records(nblk=96)[: 96 * 64 - 37]     # ragged tail
    out = E.decompress(E.compress_sparse(rec))
    np.testing.assert_array_equal(out, rec)


def test_sparse_dense_fallback():
    rng = np.random.default_rng(3)
    rec = rng.integers(0, 256, 64 * 256, dtype=np.uint8)   # every block hit
    blob = E.compress_sparse(rec)
    # fell back to a plain format (magic != SDS1), still exact
    assert int(np.frombuffer(blob[:4].tobytes(), np.uint32)[0]) != E._MAGICS
    np.testing.assert_array_equal(E.decompress(blob), rec)


def test_sparse_all_trivial():
    rec = np.full(64 * 64, 127, np.uint8)
    blob = E.compress_sparse(rec)
    assert blob.size < 100
    np.testing.assert_array_equal(E.decompress(blob), rec)


def test_sparse_nested_header_bomb_rejected():
    """A crafted chain of nested SDS1 headers must raise a typed
    EntropyError, never an untyped RecursionError (review finding,
    round 4: each level costs ~21 untrusted bytes)."""
    def wrap(payload):
        out = np.empty(21 + payload.size, np.uint8)
        out[:4] = np.frombuffer(np.uint32(E._MAGICS).tobytes(), np.uint8)
        out[4:12] = np.frombuffer(np.uint64(512).tobytes(), np.uint8)
        out[12:16] = np.frombuffer(np.uint32(8).tobytes(), np.uint8)
        out[16:20] = np.frombuffer(np.uint32(1).tobytes(), np.uint8)
        out[20] = 1
        out[21:] = payload
        return out

    rec = np.full(8 * 64, 127, np.uint8)
    rec[0] = 1
    evil = E.compress_sparse(rec)
    for _ in range(600):
        evil = wrap(evil)
    with pytest.raises(E.EntropyError):
        E.decompress(evil)


def test_sparse_batch_matches_per_frame():
    """compress_sparse_batch: one batched count dispatch, per-frame
    streams byte-identical to per-frame compress_sparse; typed errors
    on bad shapes (round-4 review follow-up)."""
    recs = np.stack([_sparse_records(nblk=128, active_every=k + 2,
                                     seed=k) for k in range(3)])
    got = E.compress_sparse_batch(recs)
    assert len(got) == 3
    for i in range(3):
        np.testing.assert_array_equal(got[i], E.compress_sparse(recs[i]))
        np.testing.assert_array_equal(E.decompress(got[i]), recs[i])
    with pytest.raises(E.EntropyError):
        E.compress_sparse_batch(recs[0])          # 1-D
    with pytest.raises(E.EntropyError):
        E.compress_sparse_batch(np.zeros((2, 0), np.uint8))


def test_sparse_device_expand_matches():
    import jax.numpy as jnp
    rec = _sparse_records(nblk=256, active_every=3, seed=7)
    blocks, n = E._sparse_blocks(rec)
    count = int(E._sparse_count_jit()(blocks))
    cap = 1
    while cap < count:
        cap *= 2
    bitmap, kept = E._precompact_jit(min(cap, blocks.shape[0]))(blocks)
    out = np.asarray(E.expand_sparse_device(bitmap, np.asarray(kept), n))
    np.testing.assert_array_equal(out, rec)


def test_sparse_corrupt_headers_typed():
    rec = _sparse_records()
    blob = E.compress_sparse(rec)
    for mut in (blob[:10], blob[:24]):
        with pytest.raises(E.EntropyError):
            E.decompress(mut)
    # flipped bitmap bit -> count mismatch must be typed, not a crash
    bad = blob.copy()
    bad[20] ^= 1
    with pytest.raises(E.EntropyError):
        E.decompress(bad)
    # implausible counts
    bad2 = blob.copy()
    bad2[16:20] = np.frombuffer(np.uint32(1 << 30).tobytes(), np.uint8)
    with pytest.raises(E.EntropyError):
        E.decompress(bad2)


# -- SDN1 nibble-split dense fast path (round 5) ----------------------------

def _dense_records(n=1 << 18, sigma=5, seed=3):
    rng = np.random.default_rng(seed)
    return np.clip(np.round(rng.normal(127, sigma, n)),
                   0, 255).astype(np.uint8)


def test_nib_roundtrip_exact():
    rec = _dense_records()
    blob = E.compress_dense(rec)
    assert int(np.frombuffer(blob[:4].tobytes(), np.uint32)[0]) == E._MAGICN
    np.testing.assert_array_equal(E.decompress(blob), rec)


def test_nib_edge_inputs():
    rng = np.random.default_rng(9)
    cases = [np.array([127], np.uint8),
             np.array([0, 255, 119, 134, 118, 135], np.uint8),
             rng.integers(0, 256, 7, np.uint8),
             np.full(1000, 127, np.uint8),                 # zero escapes
             np.zeros(64, np.uint8),                       # all escapes? no:
             np.arange(119, 135, dtype=np.uint8),          # exactly in-window
             _dense_records((1 << 17) + 5)]                # odd size
    for arr in cases:
        blob = E.compress_dense(arr, max_escape_frac=1.0)
        np.testing.assert_array_equal(E.decompress(blob), arr)
    with pytest.raises(E.EntropyError):
        E.compress_dense(np.zeros(0, np.uint8))


def test_nib_escape_fallback():
    """Above max_escape_frac the call transparently returns a plain
    format; truly incompressible input lands on the stored escape
    without paying a pack pass (round-5 pre-check)."""
    rng = np.random.default_rng(11)
    rnd = rng.integers(0, 256, 1 << 18, dtype=np.uint8)
    blob = E.compress_dense(rnd)          # ~94% escapes -> fallback
    magic = int(np.frombuffer(blob[:4].tobytes(), np.uint32)[0])
    assert magic != E._MAGICN
    np.testing.assert_array_equal(E.decompress(blob), rnd)
    assert int(np.frombuffer(
        E.compress(rnd)[:4].tobytes(), np.uint32)[0]) == E._MAGIC0


def test_nib_sparse_pipeline_routing():
    """compress_sparse routes dense (every-block-significant) content
    through SDN1 by default; dense_fast=False keeps the plain pack."""
    rec = _dense_records(64 * 512)
    fast = E.compress_sparse(rec)
    slow = E.compress_sparse(rec, dense_fast=False)
    assert int(np.frombuffer(fast[:4].tobytes(), np.uint32)[0]) \
        == E._MAGICN
    assert int(np.frombuffer(slow[:4].tobytes(), np.uint32)[0]) \
        != E._MAGICN
    np.testing.assert_array_equal(E.decompress(fast), rec)
    np.testing.assert_array_equal(E.decompress(slow), rec)


def test_nib_corrupt_streams_typed():
    rec = _dense_records(1 << 16)
    blob = E.compress_dense(rec)
    # truncations at every region boundary
    for cut in (3, 12, 19, 20 + (1 << 13), blob.size - 1):
        with pytest.raises(E.EntropyError):
            E.decompress(blob[:cut])
    # stray bitmap bit -> popcount/esc_count mismatch, typed
    bad = blob.copy()
    bad[20] ^= 0x40
    with pytest.raises(E.EntropyError):
        E.decompress(bad)
    # implausible symbol count
    bad2 = blob.copy()
    bad2[4:12] = np.frombuffer(np.uint64(1 << 40).tobytes(), np.uint8)
    with pytest.raises(E.EntropyError):
        E.decompress(bad2)
    # nested SDN1/SDS1 payload magic rejected (no recursion)
    rec0 = np.full(1 << 16, 0, np.uint8)   # all escapes (frac 1.0 allowed)
    blob0 = E.compress_dense(rec0, max_escape_frac=1.0)
    np.testing.assert_array_equal(E.decompress(blob0), rec0)


def test_nib_fuzz_never_crashes():
    rng = np.random.default_rng(0xFE)
    rec = _dense_records(1 << 14)
    blob = E.compress_dense(rec)
    for _ in range(300):
        bad = blob.copy()
        k = rng.integers(1, 16)
        idx = rng.integers(0, bad.size, k)
        bad[idx] ^= rng.integers(1, 256, k).astype(np.uint8)
        try:
            out = E.decompress(bad)
            assert out.dtype == np.uint8    # survived -> sane output
        except E.EntropyError:
            pass


def test_nib_threaded_large_inputs():
    """>= 1 MB inputs take the MULTITHREADED chunked split/gather/
    popcount/fill paths in native/entropy.cpp (per-chunk escape
    offsets, 8-aligned chunk boundaries) — production 4K records are
    ~8 MB, so the threaded path is the shipping path; pin it at odd
    sizes that land chunk tails on every alignment."""
    rng = np.random.default_rng(0x51)
    for n in ((1 << 20) + 7, (1 << 21) - 3, 2 * 1024 * 1024 + 129):
        rec = np.clip(np.round(rng.normal(127, 5, n)),
                      0, 255).astype(np.uint8)
        blob = E.compress_dense(rec)
        assert int(np.frombuffer(blob[:4].tobytes(), np.uint32)[0]) \
            == E._MAGICN, n
        np.testing.assert_array_equal(E.decompress(blob), rec)
    # threaded zero-escape and all-escape extremes at >= 1 MB
    for fill in (127, 0):
        rec = np.full((1 << 20) + 11, fill, np.uint8)
        blob = E.compress_dense(rec, max_escape_frac=1.0)
        np.testing.assert_array_equal(E.decompress(blob), rec)


def test_decompress_to_device_matches_host():
    """decompress_to_device == decompress for every routed format."""
    rng = np.random.default_rng(0xDD)
    dense = _dense_records(1 << 16)
    sparse_rec = _sparse_records(nblk=256, active_every=3)
    plain = rng.integers(0, 256, 4096, dtype=np.uint8)
    allq = np.full(8 * 64, 127, np.uint8)
    blobs = [E.compress_dense(dense),
             E.compress_sparse(sparse_rec),
             E.compress_sparse(allq),          # zero kept blocks
             E.compress(plain),
             E.compress_dense(np.full(4096, 127, np.uint8))]  # 0 escapes
    for blob in blobs:
        host = E.decompress(blob)
        dev = np.asarray(E.decompress_to_device(blob))
        np.testing.assert_array_equal(dev, host)


def test_decompress_to_device_corrupt_typed():
    blob = E.compress_dense(_dense_records(1 << 14))
    for cut in (3, 12, 19, blob.size - 1):
        with pytest.raises(E.EntropyError):
            E.decompress_to_device(blob[:cut])
    bad = blob.copy()
    bad[20] ^= 0x10                      # stray bitmap bit
    with pytest.raises(E.EntropyError):
        E.decompress_to_device(bad)
    bad2 = blob.copy()
    bad2[4:12] = np.frombuffer(np.uint64(1 << 40).tobytes(), np.uint8)
    with pytest.raises(E.EntropyError):
        E.decompress_to_device(bad2)


def test_decompress_to_device_pad_bit_attack():
    """Crafted last bitmap byte: clearing a real escape bit and setting
    a PAD bit keeps the whole-byte popcount but must be a typed error
    on both decode routes (review finding — the device route counted
    pad bits and silently corrupted one record byte)."""
    n = 4097                     # one byte past an 8-multiple
    rec = np.full(n, 127, np.uint8)
    rec[4096] = 250              # single escape in the final bitmap byte
    blob = E.compress_dense(rec, max_escape_frac=1.0)
    hdr = 20
    bm_sz = (n + 7) // 8
    last = hdr + bm_sz - 1
    assert blob[last] == 0x01    # escape at bit 0 of the last byte
    bad = blob.copy()
    bad[last] = 0x80             # real bit -> pad bit, popcount preserved
    with pytest.raises(E.EntropyError):
        E.decompress(bad)
    with pytest.raises(E.EntropyError):
        E.decompress_to_device(bad)
    # and the pristine stream round-trips on both routes
    np.testing.assert_array_equal(E.decompress(blob), rec)
    np.testing.assert_array_equal(
        np.asarray(E.decompress_to_device(blob)), rec)


def test_compress_dense_list_input():
    """Non-array inputs stay on the as_u8_stream host path (review
    finding: a negative isinstance check routed lists to jax)."""
    blob = E.compress_dense([127] * 64, max_escape_frac=1.0)
    np.testing.assert_array_equal(E.decompress(blob),
                                  np.full(64, 127, np.uint8))


def test_expand_jit_pow2_bucketing():
    """Expansion jits must bucket their static capacity (review
    finding: per-count traces leaked one compile per distinct escape
    count)."""
    base = _dense_records(1 << 12)
    before = E._nib_expand_jit.cache_info().currsize
    for k in (100, 101, 102, 103):
        rec = base.copy()
        rec[:k] = 0              # k escapes
        blob = E.compress_dense(rec, max_escape_frac=1.0)
        np.testing.assert_array_equal(
            np.asarray(E.decompress_to_device(blob)), rec)
    after = E._nib_expand_jit.cache_info().currsize
    assert after - before <= 1   # all four counts share the 128-cap trace


# -- SDN2 wider-window sibling (round 5) ------------------------------------

def test_nib2_ladder_selection():
    """compress_dense ladder: SDN1 for 127±8 content, SDN2 for ±16,
    plain formats beyond."""
    rng = np.random.default_rng(0x52)
    n = 1 << 18
    for sigma, magic in ((5, E._MAGICN), (10, E._MAGICN2)):
        rec = np.clip(np.round(rng.normal(127, sigma, n)),
                      0, 255).astype(np.uint8)
        blob = E.compress_dense(rec)
        assert int(np.frombuffer(blob[:4].tobytes(), np.uint32)[0]) \
            == magic, sigma
        np.testing.assert_array_equal(E.decompress(blob), rec)
    wide = rng.integers(0, 256, n, dtype=np.uint8)
    blob = E.compress_dense(wide)
    assert int(np.frombuffer(blob[:4].tobytes(), np.uint32)[0]) \
        not in (E._MAGICN, E._MAGICN2)
    np.testing.assert_array_equal(E.decompress(blob), wide)


def test_nib2_edges_and_threaded():
    rng = np.random.default_rng(0x53)
    cases = [np.array([111, 142, 110, 143, 127, 126], np.uint8),
             np.array([126], np.uint8),
             rng.integers(0, 256, 7, dtype=np.uint8),
             np.full(1000, 130, np.uint8),
             np.clip(np.round(rng.normal(127, 10, (1 << 20) + 9)),
                     0, 255).astype(np.uint8),      # threaded, odd size
             np.arange(111, 143, dtype=np.uint8)]   # exactly in-window
    lib = E._load()
    for arr in cases:
        out = np.empty(lib.entropy_encode_nib2_bound(arr.size), np.uint8)
        r = lib.entropy_encode_nib2(E._u8p(arr), arr.size, E._u8p(out),
                                    out.size, arr.size)
        assert r > 0, arr[:8]
        out.resize(r, refcheck=False)
        np.testing.assert_array_equal(E.decompress(out), arr)


def test_nib2_corrupt_and_fuzz():
    rng = np.random.default_rng(0x54)
    rec = np.clip(np.round(rng.normal(127, 10, 1 << 14)),
                  0, 255).astype(np.uint8)
    blob = E.compress_dense(rec)
    assert int(np.frombuffer(blob[:4].tobytes(), np.uint32)[0]) \
        == E._MAGICN2
    for cut in (3, 12, 19, blob.size - 1):
        with pytest.raises(E.EntropyError):
            E.decompress(blob[:cut])
    bad = blob.copy()
    bad[20] ^= 0x08                      # stray escape-bitmap bit
    with pytest.raises(E.EntropyError):
        E.decompress(bad)
    bad2 = blob.copy()
    bad2[4:12] = np.frombuffer(np.uint64(1 << 40).tobytes(), np.uint8)
    with pytest.raises(E.EntropyError):
        E.decompress(bad2)
    for _ in range(300):
        m = blob.copy()
        k = rng.integers(1, 16)
        idx = rng.integers(0, m.size, k)
        m[idx] ^= rng.integers(1, 256, k).astype(np.uint8)
        try:
            out = E.decompress(m)
            assert out.dtype == np.uint8
        except E.EntropyError:
            pass


def test_nib2_device_split_byte_identical():
    """The SDN2 device split matches the native host split byte-for-byte
    and the ladder routes device arrays through it."""
    import jax.numpy as jnp
    rng = np.random.default_rng(0x55)
    for n, want_n2 in (((1 << 18) + 5, True), (4096, True),
                       (63, False)):     # tiny: stored escape wins
        rec = np.clip(np.round(rng.normal(127, 10, n)),
                      0, 255).astype(np.uint8)
        host_blob = E.compress_dense(rec)
        dev_blob = E.compress_dense(jnp.asarray(rec))
        magic = int(np.frombuffer(host_blob[:4].tobytes(), np.uint32)[0])
        assert (magic == E._MAGICN2) == want_n2, n
        np.testing.assert_array_equal(host_blob, dev_blob)
        np.testing.assert_array_equal(E.decompress(dev_blob), rec)
    # both windows rejected on device -> plain (still exact)
    wide = jnp.asarray(rng.integers(0, 256, 1 << 16, dtype=np.uint8))
    blob = E.compress_dense(wide)
    assert int(np.frombuffer(blob[:4].tobytes(), np.uint32)[0]) \
        not in (E._MAGICN, E._MAGICN2)
    np.testing.assert_array_equal(E.decompress(blob), np.asarray(wide))


def test_sparse_payload_fast_opt_in():
    """compress_sparse(payload_fast=True): the fps-over-bytes SDN-coded
    payload — exact recovery, SDN magic inside the SDS1 payload, and a
    worse-but-bounded ratio vs the plain default (the reason it is an
    opt-in, LESSONS.md)."""
    rng = np.random.default_rng(0x56)
    rec = np.full(64 * 2048, 127, np.uint8)
    idx = rng.choice(2048, 900, replace=False)
    for b in idx:
        rec[b * 64:b * 64 + 12] = rng.integers(119, 135, 12)
    default = E.compress_sparse(rec)
    fast = E.compress_sparse(rec, payload_fast=True)
    np.testing.assert_array_equal(E.decompress(default), rec)
    np.testing.assert_array_equal(E.decompress(fast), rec)
    # payload magic: plain family vs SDN family
    def payload_magic(blob):
        nblk = int(np.frombuffer(blob[12:16].tobytes(), np.uint32)[0])
        pay = blob[E._SPARSE_HDR + nblk // 8:]
        return int(np.frombuffer(pay[:4].tobytes(), np.uint32)[0])
    assert payload_magic(fast) in (E._MAGICN, E._MAGICN2)
    assert payload_magic(default) not in (E._MAGICN, E._MAGICN2)
    assert default.size <= fast.size          # plain is ratio-optimal
    # batched form carries the flag too
    batch = E.compress_sparse_batch(np.stack([rec, rec]),
                                    payload_fast=True)
    for bl in batch:
        np.testing.assert_array_equal(E.decompress(bl), rec)
        assert payload_magic(bl) in (E._MAGICN, E._MAGICN2)


def test_nib2_device_expansion():
    """decompress_to_device routes SDN2 through the on-device expansion
    (bit4 plane + nibbles + escapes), matching the host decode."""
    rng = np.random.default_rng(0x57)
    for n in ((1 << 17) + 3, 4096):
        rec = np.clip(np.round(rng.normal(127, 10, n)),
                      0, 255).astype(np.uint8)
        blob = E.compress_dense(rec)
        assert int(np.frombuffer(blob[:4].tobytes(), np.uint32)[0]) \
            == E._MAGICN2
        np.testing.assert_array_equal(
            np.asarray(E.decompress_to_device(blob)), rec)
    # corrupt SDN2 via the device route stays typed
    bad = blob.copy()
    bad[20] ^= 0x04
    with pytest.raises(E.EntropyError):
        E.decompress_to_device(bad)
    for cut in (19, 25, blob.size - 1):
        with pytest.raises(E.EntropyError):
            E.decompress_to_device(blob[:cut])

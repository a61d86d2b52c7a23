"""Benchmark/encode CLI mirroring the reference harness.

Reference usage (src/main.cpp:106-119):

    simd_dct <raw_grayscale_image_file> <resolutionX> <resolutionY>
        --to <file>           store the last output
        --quality <0-100>     quantization quality level
        --runs <uint>         benchmark run count (default 128, max 1024)
        --cpu-core <n>        pin thread (accepted; advisory on TPU)
        --max-simd <tier>     cap the backend tier (pallas/xla/numpy accepted
                              natively; the reference's ISA names map onto
                              tiers: avx* -> pallas, sse* -> xla, none -> numpy)
        --mode <mode>         enc-quant / enc-quant32 / enc-quant-stereo
                              (+ enc-quant32-ycbcr: 3-plane color, an
                              extension past the grayscale reference)
                              (repeatable; default: all supported)

Differences from the reference, by design: the default quality is only
applied when --quality is passed (matching src/main.cpp:123,214 where the
declared default 50 is never applied without the flag — reproduced
faithfully), and a --decode flag adds the north-star inverse path.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

MAX_SIMD_TO_TIER = {
    # native tier names
    "pallas": "pallas", "xla": "xla", "numpy": "numpy",
    # reference ISA names (src/main.cpp:89-98) mapped onto tiers
    "avx512bw": "pallas", "avx512f": "pallas", "avx2": "pallas",
    "avx": "pallas",
    "sse4.2": "xla", "sse4.1": "xla", "ssse3": "xla", "sse3": "xla",
    "sse2": "xla",
    "none": "numpy",
}

MODES = ("enc-quant", "enc-quant32", "enc-quant-stereo",
         "enc-quant32-ycbcr", "enc-quant32-ycbcr420")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="simd_dct_tpu",
        description="TPU-native 8x8 block DCT encode/decode benchmark")
    p.add_argument("file", help="raw grayscale image file")
    p.add_argument("resolution_x", type=int)
    p.add_argument("resolution_y", type=int)
    p.add_argument("--to", dest="out_file", default=None,
                   help="store the last output in the specified file "
                        "(a .sdt extension writes the self-describing "
                        "container: mode + geometry + LUTs + records, "
                        "decodable via `python -m simd_dct_tpu.container "
                        "decode`)")
    p.add_argument("--quality", type=float, default=None,
                   help="quantization quality level (scales the LUT)")
    p.add_argument("--runs", type=int, default=None,
                   help="benchmark run count (default 128, max 1024)")
    p.add_argument("--cpu-core", dest="cpu_core", type=int, default=None,
                   help="pin the host thread to a core (best-effort)")
    p.add_argument("--max-simd", dest="max_simd", default=None,
                   choices=sorted(MAX_SIMD_TO_TIER),
                   help="cap the backend tier")
    p.add_argument("--mode", action="append", dest="modes",
                   choices=MODES, default=None,
                   help="benchmark only the given mode(s); repeatable")
    p.add_argument("--decode", action="store_true",
                   help="also run the inverse path and report round-trip PSNR")
    p.add_argument("--accurate", action="store_true",
                   help="slope-based timing over vmapped batches (use on "
                        "remote/tunneled devices where per-call walls are "
                        "dominated by dispatch overhead)")
    p.add_argument("--compress", action="store_true",
                   help="entropy-code each mode's records (on-device "
                        "histogram + native 4-stream Huffman) and report "
                        "the ratio; with --to, the compressed stream is "
                        "written instead of raw records")
    p.add_argument("--rle", action="store_true",
                   help="with --compress: run-length-code the dominant "
                        "byte before the Huffman pack (better ratio on "
                        "typical records)")
    p.add_argument("--sparse", action="store_true",
                   help="with --compress: drop all-127 64-byte blocks "
                        "on the device before the host pack (SDS1; "
                        "lifts the pack-bound fps cap on typical "
                        "content, dense input falls back transparently)")
    p.add_argument("--stereo-layout",
                   choices=("interleaved", "planar", "native"),
                   default="interleaved",
                   help="enc-quant-stereo record layout: 'interleaved' "
                        "(reference byte stream), 'planar' (separate "
                        "views), 'native' (128-multiple padded plane "
                        "rows — the TPU fast-DMA format)")
    p.add_argument("--layout", choices=("scalar", "pair"),
                   default="scalar",
                   help="enc-quant byte layout: 'scalar' (block-"
                        "contiguous, ≙ the reference NoSimd kernel) or "
                        "'pair' (the SSE4.1 pair-cell layout)")
    p.add_argument("--start-y", type=int, default=0)
    p.add_argument("--end-y", type=int, default=None)
    p.add_argument("--sharded", type=int, default=None, metavar="N",
                   help="run enc-quant32/stereo strip-sharded over an "
                        "N-device mesh (falls back to N virtual CPU "
                        "devices when fewer accelerators exist)")
    return p


def _pin_cpu(core: int) -> None:
    try:
        os.sched_setaffinity(0, {core})
    except (AttributeError, OSError) as e:  # pragma: no cover
        print(f"warning: could not pin cpu core {core}: {e}")


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    from simd_dct_tpu.utils.metrics import psnr
    return psnr(a, b)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.cpu_core is not None:
        _pin_cpu(args.cpu_core)

    try:
        data = np.fromfile(args.file, dtype=np.uint8)
    except OSError:
        print("Failed to read file.")
        return 1
    w, h = args.resolution_x, args.resolution_y
    if w <= 0 or h <= 0:
        print("Invalid Resolution Specified. Aborting.")
        return 1
    if data.size < w * h:
        print(f"File too small: {data.size} bytes for {w}x{h}.")
        return 1
    img = data[: w * h].reshape(h, w)
    # YCbCr mode input: 3*H*W bytes of planar RGB when provided, else the
    # grayscale image replicated onto all three planes.
    if data.size >= 3 * w * h:
        rgb_planes = data[: 3 * w * h].reshape(3, h, w)
    else:
        rgb_planes = np.broadcast_to(img, (3, h, w))

    from simd_dct_tpu.dispatch.capability import honor_cpu_platform_env
    honor_cpu_platform_env()
    import jax
    import simd_dct_tpu as sd
    from simd_dct_tpu.bench.stats import (time_fn, HEADER, DEFAULT_RUN_COUNT,
                                          MAX_RUN_COUNT)
    from simd_dct_tpu.dispatch import probe, set_max_backend

    runs = args.runs if args.runs is not None else DEFAULT_RUN_COUNT
    if runs < 1 or runs > MAX_RUN_COUNT:
        print("Invalid Parameter.")
        return 1

    if args.max_simd is not None:
        # strict, like the reference: a cap naming an ISA level the
        # machine doesn't have is an error, not a silent degrade
        # (src/main.cpp:283-438)
        from simd_dct_tpu.api import NotSupportedError
        try:
            set_max_backend(MAX_SIMD_TO_TIER[args.max_simd], strict=True)
        except NotSupportedError as e:
            print(f"error: {e}")
            return 1

    lut = sd.default_quant_lut(args.quality)

    info = probe()
    print(f"device: {info.banner}")
    print()

    modes = args.modes or list(MODES)
    end_y = args.end_y if args.end_y is not None else h
    imgj = jax.numpy.asarray(img)
    last_output = None
    last_mode = None
    print(HEADER)

    def _slope_row(name, enc_one, base, nbytes):
        """Accurate per-image cost: slope between two vmapped batch sizes,
        wall ended by a host-side checksum scalar (see utils docs)."""
        import time as _time
        import jax.numpy as jnp
        walls = {}
        for bsz in (4, 20):
            xb = jnp.stack([base] * bsz)
            # TWO dispatches: the jit boundary forces the byte records to
            # materialize (a single fused jit lets XLA either elide the
            # layout work or fuse it into a pathological gather); the
            # second jit's checksum scalar landing on the host ends the
            # wall.
            f1 = jax.jit(lambda xs: jax.vmap(enc_one)(xs))
            f2 = jax.jit(lambda o: jnp.sum(
                o.reshape(o.shape[0], -1).astype(jnp.int32)))
            float(f2(f1(xb)))
            best = 1e9
            for _ in range(max(3, min(runs, 16))):
                t0 = _time.perf_counter()
                float(f2(f1(xb)))
                best = min(best, _time.perf_counter() - t0)
            walls[bsz] = best
            del xb, f1, f2
        per_s = max((walls[20] - walls[4]) / 16, 1e-12)
        gbps = nbytes / per_s / 1e9
        print(f"{name + ' (slope)':<28} | {per_s / nbytes * 1e9:9.4f} ns/B | "
              f"{gbps:8.2f} GB/s per image")

    def run_mode(name, enc, dec, ref_for_psnr, enc_one=None,
                 enc_base=None, nbytes=None):
        nonlocal last_output, last_mode
        last_mode = name
        nbytes = img.size if nbytes is None else nbytes
        out = enc()
        jax.block_until_ready(out)
        # the accurate (slope) path vmaps the entry point, which the
        # numpy golden tier cannot trace — fall back to direct walls
        from simd_dct_tpu.dispatch import select_backend
        accurate = args.accurate and select_backend() != "numpy"
        if accurate and enc_one is not None:
            _slope_row(name, enc_one,
                       imgj if enc_base is None else enc_base, nbytes)
        else:
            stats = time_fn(name, lambda: jax.block_until_ready(enc()),
                            bytes_processed=nbytes, runs=runs)
            print(stats.row())
        last_output = np.asarray(out)
        if args.decode and dec is not None:
            rec = np.asarray(dec(last_output))
            print(f"{name + ' round-trip':<28} | PSNR "
                  f"{_psnr(ref_for_psnr, rec):6.2f} dB")
        if args.compress:
            import time as _t
            from simd_dct_tpu import entropy as E
            t0 = _t.perf_counter()
            blob = (E.compress_sparse(out, rle=args.rle)
                    if args.sparse
                    else E.compress_records(out, rle=args.rle))
            dt = _t.perf_counter() - t0
            print(f"{name + ' entropy':<28} | "
                  f"{last_output.size / blob.size:6.2f}x ratio | "
                  f"{last_output.size / dt / 1e6:7.0f} MB/s pack")
            last_output = blob

    mesh = None
    if args.sharded is not None:
        from simd_dct_tpu import dist
        mesh = dist.make_mesh(args.sharded)
        print(f"sharded: {args.sharded}-device mesh "
              f"[{mesh.devices.flat[0].platform}]")
        if (h // 2) % (8 * args.sharded):
            print("Invalid Parameter (H/2 must split into 8-row strips "
                  "across the mesh).")
            return 1

    if "enc-quant" in modes:
        if mesh is not None:
            print(f"{'enc-quant':<28} | no sharded path (strip-dp covers "
                  "enc-quant32/stereo); skipped")
        else:
            run_mode(
                "enc-quant",
                lambda: sd.encode_quantize(imgj, lut, args.start_y, end_y,
                                           layout=args.layout),
                lambda d: sd.decode_quantize(d, lut, w, h,
                                             layout=args.layout),
                img[: h // 2],
                enc_one=lambda im: sd.encode_quantize(
                    im, lut, args.start_y, end_y, layout=args.layout))
    if "enc-quant32" in modes:
        if w % 64:
            print(f"{'enc-quant32':<28} | not supported (W % 64 != 0)")
        elif mesh is not None:
            from simd_dct_tpu import dist
            run_mode(
                "enc-quant32",
                lambda: dist.encode_quantize32_sharded(imgj, lut * 255.0,
                                                       mesh),
                lambda d: np.asarray(dist.decode_quantize32_sharded(
                    jax.numpy.asarray(d).reshape(h // 16, 8 * w),
                    lut * 255.0, w, h, mesh)),
                img[: h // 2])
        else:
            run_mode(
                "enc-quant32",
                lambda: sd.encode_quantize32(imgj, lut * 255.0,
                                             args.start_y, end_y),
                lambda d: sd.decode_quantize32(d, lut * 255.0, w, h),
                img[: h // 2],
                enc_one=lambda im: sd.encode_quantize32(
                    im, lut * 255.0, args.start_y, end_y))
    if "enc-quant-stereo" in modes:
        if mesh is not None:
            from simd_dct_tpu import dist
            run_mode(
                "enc-quant-stereo",
                lambda: dist.encode_quantize_stereo_sharded(imgj, lut, mesh,
                                                            gather=True),
                lambda d: np.asarray(dist.decode_quantize_stereo_sharded(
                    jax.numpy.asarray(d).reshape(64, h // 16, w // 4),
                    lut, w, h, mesh)),
                img,
                nbytes=2 * img.size)   # both views in + H*W records out
        else:
            vl = args.stereo_layout
            run_mode(
                "enc-quant-stereo",
                lambda: sd.encode_quantize_stereo(imgj, lut, args.start_y,
                                                  end_y, view_layout=vl),
                lambda d: sd.decode_quantize_stereo(d, lut, w, h,
                                                    view_layout=vl),
                img,
                enc_one=lambda im: sd.encode_quantize_stereo(
                    im, lut, args.start_y, end_y, view_layout=vl),
                nbytes=2 * img.size)   # both views in + H*W records out

    if "enc-quant32-ycbcr" in modes:
        if w % 64:
            print(f"{'enc-quant32-ycbcr':<28} | not supported (W % 64 != 0)")
        elif mesh is not None:
            print(f"{'enc-quant32-ycbcr':<28} | no sharded path; skipped")
        else:
            from simd_dct_tpu.layout import BASE_CHROMA_QUANT_TABLE
            # chroma follows the same quality convention as luma: unscaled
            # when --quality is omitted (matches Encoder.chroma_lut; the
            # reference applies quality only when the flag is passed,
            # src/main.cpp:123,214)
            q = 1.0 if args.quality is None else args.quality
            chroma = BASE_CHROMA_QUANT_TABLE * q * 255.0
            planesj = jax.numpy.asarray(np.ascontiguousarray(rgb_planes))
            run_mode(
                "enc-quant32-ycbcr",
                lambda: sd.api.encode_quantize32_ycbcr(planesj, lut * 255.0,
                                                       chroma),
                lambda d: sd.api.decode_quantize32_ycbcr(d, lut * 255.0,
                                                         chroma, w, h),
                np.asarray(rgb_planes)[:, : h // 2],
                enc_one=lambda pl3: sd.api.encode_quantize32_ycbcr(
                    pl3, lut * 255.0, chroma),
                enc_base=planesj,
                nbytes=3 * img.size)   # 3 planes per frame

    if "enc-quant32-ycbcr420" in modes:
        if w % 128 or h % 32:
            print(f"{'enc-quant32-ycbcr420':<28} | not supported "
                  "(needs W % 128 == 0 and H % 32 == 0)")
        elif mesh is not None:
            print(f"{'enc-quant32-ycbcr420':<28} | no sharded path; skipped")
        else:
            from simd_dct_tpu.layout import BASE_CHROMA_QUANT_TABLE
            q = 1.0 if args.quality is None else args.quality
            chroma = BASE_CHROMA_QUANT_TABLE * q * 255.0
            planesj = jax.numpy.asarray(np.ascontiguousarray(rgb_planes))
            run_mode(
                "enc-quant32-ycbcr420",
                lambda: sd.api.encode_quantize32_ycbcr420(
                    planesj, lut * 255.0, chroma),
                lambda d: sd.api.decode_quantize32_ycbcr420(
                    d, lut * 255.0, chroma, w, h),
                np.asarray(rgb_planes)[:, : h // 2],
                enc_one=lambda pl3: sd.api.encode_quantize32_ycbcr420(
                    pl3, lut * 255.0, chroma),
                enc_base=planesj,
                nbytes=3 * img.size)   # 3 planes in; 1.5 B/px records out

    if args.out_file and last_output is not None:
        if args.out_file.endswith(".sdt") and last_mode is not None:
            # self-describing container for the LAST mode that actually
            # RAN ("store the last output", ≙ src/main.cpp:594-606;
            # requested-but-unsupported/skipped modes must not be picked)
            from simd_dct_tpu import container as C
            last = last_mode
            if last == "enc-quant" and args.layout == "pair":
                last = "enc-quant-pair"   # container mode string carries
                # the byte layout so decode needs no side channel
            src = rgb_planes if last.startswith("enc-quant32-ycbcr") else img
            C.encode(np.ascontiguousarray(src), last,
                     quality=args.quality, compress=args.compress,
                     rle=args.rle, sparse=args.sparse,
                     start_y=args.start_y, end_y=args.end_y,
                     view_layout=(args.stereo_layout
                                  if last == "enc-quant-stereo"
                                  else "interleaved")).tofile(args.out_file)
        else:
            last_output.tofile(args.out_file)
    return 0


if __name__ == "__main__":
    sys.exit(main())

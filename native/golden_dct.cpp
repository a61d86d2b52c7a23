// Native golden oracle for simd_dct_tpu.
//
// A from-scratch C++ implementation of the *scalar semantics* of every
// encode mode of the reference (rainerzufalldererste/simd_dct), used as the
// bit-exactness oracle for the TPU framework's tests (SURVEY.md §4: the
// reference ships no tests; its NoSimd kernels act as golden semantics —
// this file plays that role here, compiled WITHOUT fast-math so it defines
// reproducible IEEE f32 behavior, unlike the reference binary built with
// floatingpoint "Fast", project.lua:59).
//
// Semantics mirrored (with reference citations; no code copied):
//  * 1-D DCT butterfly dataflow: src/simd_dct.cpp:138-172 (inplace_dct8) —
//    the exact association order matters for f32 bit-exactness, so the
//    butterfly is reproduced as documented math, not as a matmul.
//  * enc-quant: src/simd_dct.cpp:300-395 (scalar), 1540-1704 (SSE41 layout)
//  * enc-quant32: src/simd_dct.cpp:1869-2059 (AVX-512 semantics)
//  * stereo planar: src/simd_dct.cpp:177-298
//
// Error codes mirror simdDctResult (src/simd_dct.h:22-27):
//   0 = success, 1 = invalid parameter, 2 = not supported.

#include <cmath>
#include <cstddef>
#include <cstdint>
#include <cfenv>

namespace {

constexpr float kCa = 1.3870398453221474618216191915664f;   // sqrt2*cos(pi/16)
constexpr float kCb = 1.3065629648763765278566431734272f;   // sqrt2*cos(2pi/16)
constexpr float kCc = 1.1758756024193587169744671046113f;   // sqrt2*cos(3pi/16)
constexpr float kCd = 0.78569495838710218127789736765722f;  // sqrt2*cos(5pi/16)
constexpr float kCe = 0.54119610014619698439972320536639f;  // sqrt2*cos(6pi/16)
constexpr float kCf = 0.27589937928294301233595756366937f;  // sqrt2*cos(7pi/16)
constexpr float kNorm = 0.35355339059327376220042218105242f;  // 1/sqrt(8)

enum Rounding { kRne = 0, kScalar = 1, kClampFirst = 2 };
enum Layout { kBlockContiguous = 0, kPairCell = 1, kPairCellAsWritten = 2 };

// 1-D 8-point DCT-II, same dataflow as the reference butterfly.
void dct8(float* v) {
  const float x07p = v[0] + v[7];
  const float x16p = v[1] + v[6];
  const float x25p = v[2] + v[5];
  const float x34p = v[3] + v[4];
  const float x07m = v[0] - v[7];
  const float x61m = v[6] - v[1];
  const float x25m = v[2] - v[5];
  const float x43m = v[4] - v[3];
  const float pp = x07p + x34p;
  const float pm = x07p - x34p;
  const float qp = x16p + x25p;
  const float qm = x16p - x25p;
  v[0] = kNorm * (pp + qp);
  v[2] = kNorm * (kCb * pm + kCe * qm);
  v[4] = kNorm * (pp - qp);
  v[6] = kNorm * (kCe * pm - kCb * qm);
  v[1] = kNorm * (kCa * x07m - kCc * x61m + kCd * x25m - kCf * x43m);
  v[3] = kNorm * (kCc * x07m + kCf * x61m - kCa * x25m + kCd * x43m);
  v[5] = kNorm * (kCd * x07m + kCa * x61m + kCf * x25m - kCc * x43m);
  v[7] = kNorm * (kCf * x07m + kCd * x61m + kCc * x25m + kCa * x43m);
}

void transpose8(float* b) {
  for (int i = 0; i < 8; i++)
    for (int j = i + 1; j < 8; j++) {
      const float t = b[i * 8 + j];
      b[i * 8 + j] = b[j * 8 + i];
      b[j * 8 + i] = t;
    }
}

// enc-quant orientation: DCT rows, transpose, DCT rows (fx-major buffer).
void dct2d_fx_major(float* b) {
  for (int i = 0; i < 8; i++) dct8(b + i * 8);
  transpose8(b);
  for (int i = 0; i < 8; i++) dct8(b + i * 8);
}

// stereo / mode32 orientation: leading transpose (fy-major buffer).
void dct2d_fy_major(float* b) {
  transpose8(b);
  for (int i = 0; i < 8; i++) dct8(b + i * 8);
  transpose8(b);
  for (int i = 0; i < 8; i++) dct8(b + i * 8);
}

float clampf(float v, float lo, float hi) {
  return v > lo ? (v < hi ? v : hi) : lo;
}

int32_t clampi(int32_t v, int32_t lo, int32_t hi) {
  return v > lo ? (v < hi ? v : hi) : lo;
}

// Quantize one coefficient (buffer order aligned with lut order).
// coeff_scale: multiplier already includes the per-mode normalization.
uint8_t quantize_one(float coeff, float q_rne, float q_scalar, int rounding) {
  switch (rounding) {
    case kScalar:
      // roundf(clamp(c*q + 127/255, 0, 1) * 255), src/simd_dct.cpp:245.
      return (uint8_t)roundf(
          clampf(coeff * q_scalar + (127.0f / 255.0f), 0.f, 1.f) * 255.f);
    case kClampFirst:
      // float clamp after bias, then RNE convert, src/simd_dct.cpp:1245-1249.
      return (uint8_t)nearbyintf(clampf(coeff * q_rne + 127.0f, 0.f, 255.f));
    default:
      // RNE then integer clamp, src/simd_dct.cpp:1020-1024.
      return (uint8_t)clampi((int32_t)nearbyintf(coeff * q_rne) + 127, 0, 255);
  }
}

void build_qtables(const float* lut, float* q_rne, float* q_scalar) {
  constexpr float vr = 0.95f;
  for (int i = 0; i < 64; i++) {
    q_rne[i] = 255.0f / (lut[i] * vr);     // src/simd_dct.cpp:910-925
    q_scalar[i] = 1.0f / (lut[i] * vr);    // src/simd_dct.cpp:194-212
  }
}

// Byte offset of buffer coefficient p of block blk inside the SIMD
// enc-quant pair cell (src/simd_dct.cpp:1662-1670); as_written=1 places the
// second half at +128 (the kernels' overlapping store), else +64 (intended).
size_t pair_offset(int blk, int p, int as_written) {
  const int i = p / 8, j = p % 8;
  const int half = (j >> 1) & 1;
  const int q = (j / 4) * 2 + (j % 2);
  return (size_t)(half * (as_written ? 128 : 64) + i * 8 + blk * 4 + q);
}

void load_block(const uint8_t* src, size_t stride, float scale, float* out) {
  for (int r = 0; r < 8; r++)
    for (int c = 0; c < 8; c++)
      out[r * 8 + c] = (float)src[r * stride + c] * scale;
}

}  // namespace

extern "C" {

// enc-quant: block-contiguous (or SIMD pair-cell) output, TOP view only.
// legacy_range selects the NoSimd y-vs-startY comparison quirk
// (src/simd_dct.cpp:377,384); otherwise y*2 is compared (:1686).
// Odd-geometry note (SURVEY.md §7 "odd geometry rules"): like the
// reference, H only needs to be a multiple of 8.  When H % 16 == 8 the
// strip loop's last strip (y < h/2, src/simd_dct.cpp:268) reads 4 rows
// past the first view into the second and writes ceil((h/2)/8)*8*w
// output bytes — the caller must size the buffer accordingly.
int golden_encode_quantize(const uint8_t* from, uint8_t* to, const float* lut,
                           size_t w, size_t h, size_t start_y, size_t end_y,
                           int rounding, int layout, int legacy_range) {
  if (!from || !to || !lut) return 1;
  if ((w & 7) || (h & 7)) return 2;
  fesetround(FE_TONEAREST);
  float q_rne[64], q_scalar[64];
  build_qtables(lut, q_rne, q_scalar);
  float buf[64];
  for (size_t y = 0; y < h / 2; y += 8) {
    const size_t cmp = legacy_range ? y : y * 2;
    if (cmp < start_y) continue;
    if (cmp > end_y) break;
    uint8_t* strip = to + y * w;
    for (size_t bx = 0; bx < w / 8; bx++) {
      load_block(from + y * w + bx * 8, w, 1.0f / 255.0f, buf);
      dct2d_fx_major(buf);
      uint8_t bytes[64];
      for (int p = 0; p < 64; p++)
        bytes[p] = quantize_one(buf[p], q_rne[p], q_scalar[p], rounding);
      if (layout == kBlockContiguous) {
        for (int p = 0; p < 64; p++) strip[bx * 64 + p] = bytes[p];
      } else {
        const int as_written = (layout == kPairCellAsWritten) ? 1 : 0;
        uint8_t* cell = strip + (bx / 2) * 128;
        // buffer end: whole strips, including the H%16==8 spill strip
        const uint8_t* limit = to + ((h / 2 + 7) / 8) * 8 * w;
        for (int p = 0; p < 64; p++) {
          uint8_t* dst = cell + pair_offset((int)(bx & 1), p, as_written);
          if (dst < limit) *dst = bytes[p];
        }
      }
    }
  }
  return 0;
}

// enc-quant32: 8-block-group coefficient-major, raw 0..255 domain, TOP view.
int golden_encode_quantize32(const uint8_t* from, uint8_t* to,
                             const float* lut, size_t w, size_t h,
                             size_t start_y, size_t end_y, int rounding) {
  if (!from || !to || !lut) return 1;
  if ((w & 63) || (h & 7)) return 2;  // src/simd_dct.cpp:118
  fesetround(FE_TONEAREST);
  float q_rne[64], q_scalar[64];
  build_qtables(lut, q_rne, q_scalar);
  float buf[64];
  for (size_t y = 0; y < h / 2; y += 8) {
    if (y * 2 < start_y) continue;
    if (y * 2 > end_y) break;
    uint8_t* strip = to + y * w;
    for (size_t g = 0; g < w / 64; g++) {
      for (int b = 0; b < 8; b++) {
        load_block(from + y * w + g * 64 + b * 8, w, 1.0f, buf);  // raw
        dct2d_fy_major(buf);
        for (int p = 0; p < 64; p++)
          strip[g * 512 + p * 8 + b] =
              quantize_one(buf[p], q_rne[p], q_scalar[p], rounding);
      }
    }
  }
  return 0;
}

// stereo planar: 64 coefficient planes, both views interleaved per strip.
int golden_encode_quantize_stereo(const uint8_t* from, uint8_t* to,
                                  const float* lut, size_t w, size_t h,
                                  size_t start_y, size_t end_y, int rounding) {
  if (!from || !to || !lut) return 1;
  if ((w & 7) || (h & 7)) return 2;
  // H % 16 == 8 would make the last strip's RIGHT-view read run past the
  // end of the input buffer (src/simd_dct.cpp:292 reads from
  // pFrom + w*h/2 + (y..y+8)*w with y+8 > h/2) — undefined behavior in
  // the reference; rejected here instead of reproduced.
  if (h & 15) return 2;
  fesetround(FE_TONEAREST);
  float q_rne[64], q_scalar[64];
  build_qtables(lut, q_rne, q_scalar);
  const size_t plane = (w * h) / 64;   // src/simd_dct.cpp:260
  const size_t blocks_per_row = w / 8;
  float buf[64];
  for (size_t y = 0; y < h / 2; y += 8) {
    if (y * 2 < start_y) continue;
    if (y * 2 > end_y) break;
    const size_t cursor = (y / 8) * (w / 4);  // src/simd_dct.cpp:275
    for (int view = 0; view < 2; view++) {
      const uint8_t* src = from + y * w + (size_t)view * (w * h / 2);
      for (size_t bx = 0; bx < blocks_per_row; bx++) {
        load_block(src + bx * 8, w, 1.0f / 255.0f, buf);
        dct2d_fy_major(buf);
        const size_t pos = cursor + (size_t)view * blocks_per_row + bx;
        for (int p = 0; p < 64; p++)
          to[(size_t)p * plane + pos] =
              quantize_one(buf[p], q_rne[p], q_scalar[p], rounding);
      }
    }
  }
  return 0;
}

// ---- decode (north-star inverse; no reference analog) -------------------
// The inverse 1-D transform is x = D^T c, evaluated as plain dot products
// in strict IEEE f32 (documented order: ascending k).

namespace {

void idct8(float* v) {
  // Column k of the forward butterfly basis D (D[j][k] listed per j).
  static const float kD[8][8] = {
      {kNorm, kNorm, kNorm, kNorm, kNorm, kNorm, kNorm, kNorm},
      {kNorm * kCa, kNorm * kCc, kNorm * kCd, kNorm * kCf,
       -kNorm * kCf, -kNorm * kCd, -kNorm * kCc, -kNorm * kCa},
      {kNorm * kCb, kNorm * kCe, -kNorm * kCe, -kNorm * kCb,
       -kNorm * kCb, -kNorm * kCe, kNorm * kCe, kNorm * kCb},
      {kNorm * kCc, -kNorm * kCf, -kNorm * kCa, -kNorm * kCd,
       kNorm * kCd, kNorm * kCa, kNorm * kCf, -kNorm * kCc},
      {kNorm, -kNorm, -kNorm, kNorm, kNorm, -kNorm, -kNorm, kNorm},
      {kNorm * kCd, -kNorm * kCa, kNorm * kCf, kNorm * kCc,
       -kNorm * kCc, -kNorm * kCf, kNorm * kCa, -kNorm * kCd},
      {kNorm * kCe, -kNorm * kCb, kNorm * kCb, -kNorm * kCe,
       -kNorm * kCe, kNorm * kCb, -kNorm * kCb, kNorm * kCe},
      {kNorm * kCf, -kNorm * kCd, kNorm * kCc, -kNorm * kCa,
       kNorm * kCa, -kNorm * kCc, kNorm * kCd, -kNorm * kCf}};
  float out[8];
  for (int n = 0; n < 8; n++) {
    float acc = 0.0f;
    for (int k = 0; k < 8; k++) acc += kD[k][n] * v[k];
    out[n] = acc;
  }
  for (int n = 0; n < 8; n++) v[n] = out[n];
}

void idct2d(float* b) {  // inverse of dct2d_fy_major orientation
  for (int i = 0; i < 8; i++) idct8(b + i * 8);
  transpose8(b);
  for (int i = 0; i < 8; i++) idct8(b + i * 8);
  transpose8(b);
}

void idct2d_fx(float* b) {  // inverse of dct2d_fx_major orientation
  for (int i = 0; i < 8; i++) idct8(b + i * 8);
  transpose8(b);
  for (int i = 0; i < 8; i++) idct8(b + i * 8);
}

uint8_t to_pixel(float v) {
  return (uint8_t)clampi((int32_t)nearbyintf(v), 0, 255);
}

}  // namespace

// decode enc-quant32: group-of-8 records -> TOP view pixels.
int golden_decode_quantize32(const uint8_t* from, uint8_t* to,
                             const float* lut, size_t w, size_t h) {
  if (!from || !to || !lut) return 1;
  if ((w & 63) || (h & 7)) return 2;
  if (h & 15) return 2;  // decode output is exactly h/2 rows: no spill
  fesetround(FE_TONEAREST);
  float qi[64];
  constexpr float vr = 0.95f;
  for (int i = 0; i < 64; i++) qi[i] = (lut[i] * vr) / 255.0f;
  float buf[64];
  for (size_t y = 0; y < h / 2; y += 8) {
    const uint8_t* strip = from + y * w;
    for (size_t g = 0; g < w / 64; g++) {
      for (int b = 0; b < 8; b++) {
        for (int p = 0; p < 64; p++)
          buf[p] = ((float)strip[g * 512 + (size_t)p * 8 + b] - 127.0f)
                   * qi[p];
        idct2d(buf);
        uint8_t* dst = to + y * w + g * 64 + (size_t)b * 8;
        for (int r = 0; r < 8; r++)
          for (int c = 0; c < 8; c++)
            dst[(size_t)r * w + c] = to_pixel(buf[r * 8 + c]);
      }
    }
  }
  return 0;
}

// decode stereo planar: 64 planes -> full (H, W) image.
int golden_decode_quantize_stereo(const uint8_t* from, uint8_t* to,
                                  const float* lut, size_t w, size_t h) {
  if (!from || !to || !lut) return 1;
  if ((w & 7) || (h & 7)) return 2;
  if (h & 15) return 2;  // decode output is exactly h/2 rows: no spill
  fesetround(FE_TONEAREST);
  float qi[64];
  constexpr float vr = 0.95f;
  for (int i = 0; i < 64; i++) qi[i] = (lut[i] * vr) / 255.0f;
  const size_t plane = (w * h) / 64;
  const size_t bpr = w / 8;
  float buf[64];
  for (size_t y = 0; y < h / 2; y += 8) {
    const size_t cursor = (y / 8) * (w / 4);
    for (int view = 0; view < 2; view++) {
      uint8_t* dst_base = to + (y + (size_t)view * (h / 2)) * w;
      for (size_t bx = 0; bx < bpr; bx++) {
        const size_t pos = cursor + (size_t)view * bpr + bx;
        for (int p = 0; p < 64; p++)
          buf[p] = ((float)from[(size_t)p * plane + pos] - 127.0f) * qi[p];
        idct2d(buf);
        for (int r = 0; r < 8; r++)
          for (int c = 0; c < 8; c++)
            dst_base[(size_t)r * w + bx * 8 + c] =
                to_pixel(buf[r * 8 + c] * 255.0f);
      }
    }
  }
  return 0;
}

// decode enc-quant: block-contiguous (or SIMD pair-cell) records -> TOP
// view pixels (fx-major inverse, normalized domain).  The overlapping
// pair_as_written layout loses the clobbered bytes, so it has no
// decodable inverse (not supported).
int golden_decode_quantize(const uint8_t* from, uint8_t* to,
                           const float* lut, size_t w, size_t h,
                           int layout) {
  if (!from || !to || !lut) return 1;
  if ((w & 7) || (h & 7) || layout == kPairCellAsWritten) return 2;
  if (h & 15) return 2;  // decode output is exactly h/2 rows: no spill
  fesetround(FE_TONEAREST);
  float qi[64];
  constexpr float vr = 0.95f;
  for (int i = 0; i < 64; i++) qi[i] = (lut[i] * vr) / 255.0f;
  float buf[64];
  for (size_t y = 0; y < h / 2; y += 8) {
    const uint8_t* strip = from + y * w;
    for (size_t bx = 0; bx < w / 8; bx++) {
      if (layout == kBlockContiguous) {
        for (int p = 0; p < 64; p++)
          buf[p] = ((float)strip[bx * 64 + p] - 127.0f) * qi[p];
      } else {
        const uint8_t* cell = strip + (bx / 2) * 128;
        for (int p = 0; p < 64; p++)
          buf[p] = ((float)cell[pair_offset((int)(bx & 1), p, 0)] - 127.0f)
                   * qi[p];
      }
      idct2d_fx(buf);
      uint8_t* dst = to + y * w + bx * 8;
      for (int r = 0; r < 8; r++)
        for (int c = 0; c < 8; c++)
          dst[(size_t)r * w + c] = to_pixel(buf[r * 8 + c] * 255.0f);
    }
  }
  return 0;
}

// Raw transform entry points (for transform-level cross-checks):
// apply the butterfly 2-D DCT to n consecutive 64-float blocks in place.
void golden_dct2d_fx_major(float* blocks, size_t n) {
  for (size_t i = 0; i < n; i++) dct2d_fx_major(blocks + i * 64);
}

void golden_dct2d_fy_major(float* blocks, size_t n) {
  for (size_t i = 0; i < n; i++) dct2d_fy_major(blocks + i * 64);
}

}  // extern "C"

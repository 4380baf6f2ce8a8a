// fp_image — native host-side image kernels for the footprints_tpu input
// pipeline.
//
// The training input pipeline is bound by host-side decode+resize (PIL), not
// TPU FLOPs (SURVEY.md §7 hard part #6).  This library provides a separable
// Lanczos-3 resampler with Pillow-compatible fixed-point arithmetic so the
// numerics match the reference preprocessing (footprint_dataset.py uses
// Image.resize(LANCZOS)), plus a float32 bilinear resampler for label maps.
//
// Built as a plain shared object, called through ctypes (no pybind11
// dependency); all entry points are pure C, thread-safe, and hold no global
// state, so Python-side worker threads scale across cores.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow's fixed-point scheme
constexpr double kLanczosSupport = 3.0;

double lanczos3(double x) {
  if (x <= -kLanczosSupport || x >= kLanczosSupport) return 0.0;
  if (x == 0.0) return 1.0;
  const double pix = M_PI * x;
  return kLanczosSupport * std::sin(pix) * std::sin(pix / kLanczosSupport) /
         (pix * pix);
}

inline uint8_t clip8(int64_t v) {
  v >>= kPrecisionBits;
  return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
}

// Precompute filter bounds + normalized fixed-point coefficients for one
// axis (Pillow-compatible: half-pixel centers, support scaled by the
// downscale factor, coefficients normalized then quantized).
struct AxisFilter {
  std::vector<int> xmin, xsize;
  std::vector<std::vector<int32_t>> coeffs;
  int ksize;
};

AxisFilter build_filter(int in_size, int out_size) {
  AxisFilter f;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = kLanczosSupport * filterscale;
  f.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  f.xmin.resize(out_size);
  f.xsize.resize(out_size);
  f.coeffs.resize(out_size);

  std::vector<double> k(f.ksize);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    double ww = 0.0;
    const double ss = 1.0 / filterscale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; ++x) {
      const double w = lanczos3((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    f.coeffs[xx].resize(xmax);
    for (int x = 0; x < xmax; ++x) {
      const double kn = (ww != 0.0) ? k[x] / ww : k[x];
      // Pillow rounds half away from zero when quantizing
      f.coeffs[xx][x] = static_cast<int32_t>(
          kn < 0 ? kn * (1 << kPrecisionBits) - 0.5
                 : kn * (1 << kPrecisionBits) + 0.5);
    }
    f.xmin[xx] = xmin;
    f.xsize[xx] = xmax;
  }
  return f;
}

}  // namespace

template <int CH>
static void resize_lanczos_impl(const uint8_t* src, int sh, int sw,
                                uint8_t* dst, int dh, int dw,
                                const AxisFilter& fh, const AxisFilter& fv) {
  // horizontal pass into an intermediate [sh, dw, CH] buffer
  std::vector<uint8_t> mid(static_cast<size_t>(sh) * dw * CH);
  const int32_t half = 1 << (kPrecisionBits - 1);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * CH;
    uint8_t* mrow = mid.data() + static_cast<size_t>(y) * dw * CH;
    for (int x = 0; x < dw; ++x) {
      const int xmin = fh.xmin[x];
      const int xsize = fh.xsize[x];
      const int32_t* k = fh.coeffs[x].data();
      int32_t ss[CH];
      for (int c = 0; c < CH; ++c) ss[c] = half;
      const uint8_t* sp = srow + xmin * CH;
      for (int i = 0; i < xsize; ++i) {
        const int32_t ki = k[i];
        for (int c = 0; c < CH; ++c) ss[c] += sp[i * CH + c] * ki;
      }
      for (int c = 0; c < CH; ++c) mrow[x * CH + c] = clip8(ss[c]);
    }
  }

  // vertical pass: inner loop contiguous over dw*CH — auto-vectorizes
  for (int y = 0; y < dh; ++y) {
    const int ymin = fv.xmin[y];
    const int ysize = fv.xsize[y];
    const int32_t* k = fv.coeffs[y].data();
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * CH;
    const int row = dw * CH;
    for (int x = 0; x < row; ++x) {
      int32_t ss = half;
      for (int i = 0; i < ysize; ++i)
        ss += mid[static_cast<size_t>(ymin + i) * row + x] * k[i];
      drow[x] = clip8(ss);
    }
  }
}

extern "C" {

// Lanczos-3 resize of an interleaved uint8 image [sh, sw, ch] ->
// [dh, dw, ch], Pillow-compatible numerics.
void fp_resize_lanczos_u8(const uint8_t* src, int sh, int sw, int ch,
                          uint8_t* dst, int dh, int dw) {
  const AxisFilter fh = build_filter(sw, dw);
  const AxisFilter fv = build_filter(sh, dh);
  switch (ch) {
    case 1: resize_lanczos_impl<1>(src, sh, sw, dst, dh, dw, fh, fv); break;
    case 3: resize_lanczos_impl<3>(src, sh, sw, dst, dh, dw, fh, fv); break;
    case 4: resize_lanczos_impl<4>(src, sh, sw, dst, dh, dw, fh, fv); break;
    default: resize_lanczos_impl<3>(src, sh, sw, dst, dh, dw, fh, fv); break;
  }
}

// Lanczos resize fused with uint8 -> float32 [0,1] conversion (saves one
// pass over the output in the training loader).
void fp_resize_lanczos_u8_to_f32(const uint8_t* src, int sh, int sw, int ch,
                                 float* dst, int dh, int dw) {
  std::vector<uint8_t> tmp(static_cast<size_t>(dh) * dw * ch);
  fp_resize_lanczos_u8(src, sh, sw, ch, tmp.data(), dh, dw);
  const size_t n = tmp.size();
  constexpr float kInv = 1.0f / 255.0f;
  for (size_t i = 0; i < n; ++i) dst[i] = tmp[i] * kInv;
}

// Nearest-neighbor resize for float32 single-channel label/depth maps
// (cv2.INTER_NEAREST / PIL NEAREST semantics: src index = floor(dst*scale)).
void fp_resize_nearest_f32(const float* src, int sh, int sw, float* dst,
                           int dh, int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    int ys = static_cast<int>(y * sy);
    if (ys >= sh) ys = sh - 1;
    const float* srow = src + static_cast<size_t>(ys) * sw;
    float* drow = dst + static_cast<size_t>(y) * dw;
    for (int x = 0; x < dw; ++x) {
      int xs = static_cast<int>(x * sx);
      if (xs >= sw) xs = sw - 1;
      drow[x] = srow[xs];
    }
  }
}

}  // extern "C"

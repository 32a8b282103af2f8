// dcfa_host — native host-side image ops for the data pipeline.
//
// The reference's data loader leans on native code inside its dependencies
// (PIL's resize, OpenCV's cvtColor/LUT, `utils/dataloader_mul.py`); this
// library provides first-party C++ equivalents, loaded via ctypes (no
// pybind11 in this image).  Ops:
//   * letterbox_bicubic_u8 — PIL-parity separable bicubic resize (antialiased
//     Keys a=-0.5 kernel, uint8 round/clip between the horizontal and
//     vertical passes, exactly like PIL) pasted onto a gray(128) canvas;
//   * hsv_jitter_u8 — joint HSV color jitter: RGB→HSV (cv2 uint8 convention,
//     H in [0,180)), per-channel LUT, HSV→RGB;
//   * normalize_to_f32 — uint8 HWC → float32 /255 (fused copy).
//
// Build: g++ -O3 -shared -fPIC -o libdcfa_host.so dcfa_host.cpp
// (see dcfa_yolo_tpu/native/__init__.py for the build-on-demand loader).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// bicubic letterbox
// ---------------------------------------------------------------------------

static inline double cubic_kernel(double t) {
  // Keys cubic convolution, a = -0.5 (PIL / torch 'bicubic')
  const double a = -0.5;
  double at = std::fabs(t);
  if (at <= 1.0) return ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0;
  if (at < 2.0) return (((at - 5.0) * at + 8.0) * at - 4.0) * a;
  return 0.0;
}

struct Taps {
  std::vector<int> xmin;   // first source index per output position
  std::vector<int> count;  // number of taps
  std::vector<float> w;    // weights, row-major [out_pos][tap]
  int max_taps;
};

// PIL antialiased tap table: support scales with the downscale factor and the
// weights are normalized (see PIL's precompute_coeffs).
static Taps make_taps(int in_size, int out_size) {
  Taps taps;
  double scale = (double)in_size / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 2.0 * filterscale;
  int max_taps = (int)std::ceil(support) * 2 + 1;
  taps.xmin.resize(out_size);
  taps.count.resize(out_size);
  taps.w.assign((size_t)out_size * max_taps, 0.0);
  taps.max_taps = max_taps;
  for (int i = 0; i < out_size; i++) {
    double center = (i + 0.5) * scale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    int n = xmax - xmin;
    double sum = 0.0;
    for (int k = 0; k < n; k++) {
      double wk = cubic_kernel((xmin + k - center + 0.5) / filterscale);
      taps.w[(size_t)i * max_taps + k] = (float)wk;
      sum += wk;
    }
    if (sum != 0.0)
      for (int k = 0; k < n; k++) taps.w[(size_t)i * max_taps + k] = (float)(taps.w[(size_t)i * max_taps + k] / sum);
    taps.xmin[i] = xmin;
    taps.count[i] = n;
  }
  return taps;
}

static inline uint8_t clip_round_u8(double vd) {
  double v = std::round(vd);
  if (v < 0.0) return 0;
  if (v > 255.0) return 255;
  return (uint8_t)v;
}

// Resize src (ih x iw x 3, uint8) to (nh x nw) with PIL-parity bicubic, then
// paste into dst (oh x ow x 3) pre-filled with gray at (pad_top, pad_left).
// The paste is clipped to the canvas: negative offsets and nh/nw larger than
// the canvas are fine (the train-path random placement and mosaic tiles place
// tiles partially outside, `utils/dataloader_mul.py:150-162, 299-311`).
void letterbox_bicubic_u8(const uint8_t* src, int ih, int iw, uint8_t* dst,
                          int oh, int ow, int nh, int nw, int pad_top,
                          int pad_left, uint8_t pad_value) {
  std::memset(dst, pad_value, (size_t)oh * ow * 3);
  if (nh <= 0 || nw <= 0) return;

  // horizontal pass: (ih x iw) -> (ih x nw), uint8 intermediate like PIL
  Taps tw = make_taps(iw, nw);
  std::vector<uint8_t> mid((size_t)ih * nw * 3);
  for (int y = 0; y < ih; y++) {
    const uint8_t* row = src + (size_t)y * iw * 3;
    uint8_t* orow = mid.data() + (size_t)y * nw * 3;
    for (int x = 0; x < nw; x++) {
      const float* w = &tw.w[(size_t)x * tw.max_taps];
      int x0 = tw.xmin[x], n = tw.count[x];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < n; k++) {
        const uint8_t* p = row + (size_t)(x0 + k) * 3;
        acc0 += w[k] * p[0];
        acc1 += w[k] * p[1];
        acc2 += w[k] * p[2];
      }
      orow[(size_t)x * 3 + 0] = clip_round_u8(acc0);
      orow[(size_t)x * 3 + 1] = clip_round_u8(acc1);
      orow[(size_t)x * 3 + 2] = clip_round_u8(acc2);
    }
  }

  // vertical pass: (ih x nw) -> (nh x nw), write into the canvas (clipped)
  Taps th = make_taps(ih, nh);
  int x_lo = std::max(0, -pad_left), x_hi = std::min(nw, ow - pad_left);
  for (int y = std::max(0, -pad_top); y < std::min(nh, oh - pad_top); y++) {
    const float* w = &th.w[(size_t)y * th.max_taps];
    int y0 = th.xmin[y], n = th.count[y];
    uint8_t* orow = dst + ((size_t)(y + pad_top) * ow + pad_left) * 3;
    for (int x = x_lo; x < x_hi; x++) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < n; k++) {
        const uint8_t* p = mid.data() + ((size_t)(y0 + k) * nw + x) * 3;
        acc0 += w[k] * p[0];
        acc1 += w[k] * p[1];
        acc2 += w[k] * p[2];
      }
      orow[(size_t)x * 3 + 0] = clip_round_u8(acc0);
      orow[(size_t)x * 3 + 1] = clip_round_u8(acc1);
      orow[(size_t)x * 3 + 2] = clip_round_u8(acc2);
    }
  }
}

// ---------------------------------------------------------------------------
// HSV jitter (cv2 uint8 conventions: H in [0,180), S,V in [0,255])
// ---------------------------------------------------------------------------

void hsv_jitter_u8(uint8_t* img, long n_pixels, const uint8_t* lut_h,
                   const uint8_t* lut_s, const uint8_t* lut_v) {
  for (long i = 0; i < n_pixels; i++) {
    uint8_t* p = img + (size_t)i * 3;
    int r = p[0], g = p[1], b = p[2];
    int v = std::max(r, std::max(g, b));
    int m = std::min(r, std::min(g, b));
    int diff = v - m;
    int s = v == 0 ? 0 : (int)std::lround(255.0 * diff / v);
    double h;
    if (diff == 0) h = 0;
    else if (v == r) h = 30.0 * (g - b) / diff;
    else if (v == g) h = 60.0 + 30.0 * (b - r) / diff;
    else h = 120.0 + 30.0 * (r - g) / diff;
    if (h < 0) h += 180.0;
    int hi = (int)std::lround(h);
    if (hi >= 180) hi -= 180;

    hi = lut_h[hi];
    s = lut_s[s];
    v = lut_v[v];

    // HSV -> RGB (cv2 convention)
    double hh = hi / 30.0;  // sector in [0, 6)
    int sector = (int)hh;
    double f = hh - sector;
    double sv = s / 255.0;
    double p1 = v * (1.0 - sv);
    double p2 = v * (1.0 - sv * f);
    double p3 = v * (1.0 - sv * (1.0 - f));
    double rr, gg, bb;
    switch (sector % 6) {
      case 0: rr = v; gg = p3; bb = p1; break;
      case 1: rr = p2; gg = v; bb = p1; break;
      case 2: rr = p1; gg = v; bb = p3; break;
      case 3: rr = p1; gg = p2; bb = v; break;
      case 4: rr = p3; gg = p1; bb = v; break;
      default: rr = v; gg = p1; bb = p2; break;
    }
    p[0] = clip_round_u8(rr);
    p[1] = clip_round_u8(gg);
    p[2] = clip_round_u8(bb);
  }
}

// ---------------------------------------------------------------------------
// fused uint8 -> float32 /255 normalize
// ---------------------------------------------------------------------------

void normalize_to_f32(const uint8_t* src, float* dst, long n) {
  const float inv = 1.0f / 255.0f;
  for (long i = 0; i < n; i++) dst[i] = src[i] * inv;
}

}  // extern "C"

// Native data-loader kernels: fused letterbox-resize-normalize and HSV jitter.
//
// The reference's preprocessing hot path is PIL resize + paste + numpy
// transpose + divide (utils/dataloader.py:76-99, utils/utils.py:16-30,66) —
// four passes over every image and three temporary buffers. These kernels do
// the whole thing in one pass per output pixel, threaded with OpenMP, so the
// host pipeline can keep a TPU fed (BASELINE.json config: "augmented
// dataloader throughput ... batch 32").
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Build: see transparent_object_detection_tpu/data/native.py (build_native).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Bilinear resize of src (sh x sw x 3, uint8 RGB) to (nh x nw), placed at
// (dx, dy) on a (dh x dw) canvas filled with `fill`, output float32 in
// [0, 1] HWC. One pass: no intermediate resized buffer.
void letterbox_u8_to_f32(const uint8_t* src, int sh, int sw,
                         float* dst, int dh, int dw,
                         int nh, int nw, int dx, int dy, float fill) {
  const float inv255 = 1.0f / 255.0f;
  const float sy_ratio = nh > 1 ? (float)(sh - 1) / (float)(nh - 1) : 0.0f;
  const float sx_ratio = nw > 1 ? (float)(sw - 1) / (float)(nw - 1) : 0.0f;

#pragma omp parallel for schedule(static)
  for (int y = 0; y < dh; ++y) {
    float* row = dst + (size_t)y * dw * 3;
    const int ry = y - dy;  // row inside the resized image
    if (ry < 0 || ry >= nh) {
      for (int x = 0; x < dw * 3; ++x) row[x] = fill;
      continue;
    }
    const float sy = ry * sy_ratio;
    const int y0 = (int)sy;
    const int y1 = std::min(y0 + 1, sh - 1);
    const float fy = sy - y0;
    const uint8_t* srow0 = src + (size_t)y0 * sw * 3;
    const uint8_t* srow1 = src + (size_t)y1 * sw * 3;
    for (int x = 0; x < dw; ++x) {
      float* px = row + x * 3;
      const int rx = x - dx;
      if (rx < 0 || rx >= nw) {
        px[0] = px[1] = px[2] = fill;
        continue;
      }
      const float sx = rx * sx_ratio;
      const int x0 = (int)sx;
      const int x1 = std::min(x0 + 1, sw - 1);
      const float fx = sx - x0;
      const float w00 = (1 - fy) * (1 - fx), w01 = (1 - fy) * fx;
      const float w10 = fy * (1 - fx), w11 = fy * fx;
      for (int c = 0; c < 3; ++c) {
        const float v = w00 * srow0[x0 * 3 + c] + w01 * srow0[x1 * 3 + c] +
                        w10 * srow1[x0 * 3 + c] + w11 * srow1[x1 * 3 + c];
        px[c] = v * inv255;
      }
    }
  }
}

// HSV LUT tables for a jitter (hue rotated modulo 180 — the OpenCV uint8 H
// range — sat/val scaled and clipped), cv2.LUT semantics.
struct HsvLuts {
  uint8_t h[256], s[256], v[256];
};

static inline void build_hsv_luts(HsvLuts& t, float h_gain, float s_gain,
                                  float v_gain) {
  for (int i = 0; i < 256; ++i) {
    t.h[i] = (uint8_t)(((int)(i * h_gain + 0.5f)) % 180);
    t.s[i] = (uint8_t)std::clamp((int)(i * s_gain + 0.5f), 0, 255);
    t.v[i] = (uint8_t)std::clamp((int)(i * v_gain + 0.5f), 0, 255);
  }
}

// Jitter one RGB pixel through HSV — no libm calls (lround/fmod cost ~4x
// the whole conversion at one call site per channel).
static inline void hsv_jitter_px(uint8_t* px, const HsvLuts& t) {
  const int r = px[0], g = px[1], b = px[2];
  int mx = r > g ? r : g;
  if (b > mx) mx = b;
  int mn = r < g ? r : g;
  if (b < mn) mn = b;
  const int d = mx - mn;
  // RGB -> HSV (OpenCV uint8 convention: H in [0,180), S/V in [0,255])
  int H = 0;
  if (d > 0) {
    float hh;
    const float inv_d = 1.0f / d;
    if (mx == r)
      hh = 60.0f * (g - b) * inv_d;
    else if (mx == g)
      hh = 120.0f + 60.0f * (b - r) * inv_d;
    else
      hh = 240.0f + 60.0f * (r - g) * inv_d;
    if (hh < 0) hh += 360.0f;
    H = (int)(hh * 0.5f + 0.5f);
    if (H > 179) H = 179;
  }
  const int S0 = mx > 0 ? (int)(d * 255.0f / mx + 0.5f) : 0;
  const int H2 = t.h[H], S = t.s[S0], V = t.v[mx];
  // HSV -> RGB
  const float Hf = H2 * (2.0f / 60.0f);  // sector coordinate in [0, 6)
  const int sector = (int)Hf;
  float frac = Hf - sector;
  if (sector & 1) frac = 1.0f - frac;    // |fmod(Hf, 2) - 1| without fmod
  const float Vf = (float)V;
  const float C = Vf * (S * (1.0f / 255.0f));
  const float X = C * frac;
  const float m = Vf - C;
  float rf, gf, bf;
  switch (sector) {
    case 0:  rf = C; gf = X; bf = 0; break;
    case 1:  rf = X; gf = C; bf = 0; break;
    case 2:  rf = 0; gf = C; bf = X; break;
    case 3:  rf = 0; gf = X; bf = C; break;
    case 4:  rf = X; gf = 0; bf = C; break;
    default: rf = C; gf = 0; bf = X; break;
  }
  px[0] = (uint8_t)std::clamp((int)(rf + m + 0.5f), 0, 255);
  px[1] = (uint8_t)std::clamp((int)(gf + m + 0.5f), 0, 255);
  px[2] = (uint8_t)std::clamp((int)(bf + m + 0.5f), 0, 255);
}

// In-place HSV jitter on uint8 RGB (dataloader.py:121-133 semantics).
void hsv_jitter_u8(uint8_t* img, int h, int w,
                   float h_gain, float s_gain, float v_gain) {
  HsvLuts t;
  build_hsv_luts(t, h_gain, s_gain, v_gain);
#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    uint8_t* row = img + (size_t)y * w * 3;
    for (int x = 0; x < w; ++x) hsv_jitter_px(row + x * 3, t);
  }
}

// Fused 4-image mosaic assembly: for every output pixel, compose
// resize (bilinear, cv2 INTER_LINEAR center mapping) + horizontal flip +
// quadrant paste in ONE pass — the numpy path resizes each tile, fills a
// full-size scratch canvas per tile and copies a quadrant out of it
// (data/augment.py::mosaic4), i.e. ~9 full-canvas passes; this does one.
//
// srcs: 4 uint8 RGB images, sizes in src_hw = [h0,w0,h1,w1,h2,w2,h3,w3].
// geom: per tile [nw, nh, dx, dy, flip] (20 ints) — resized tile size and
// its paste offset on the canvas. Quadrants (cutx, cuty): tile 0 covers
// x<cutx,y<cuty; 1 x<cutx,y>=cuty; 2 x>=cutx,y>=cuty; 3 x>=cutx,y<cuty.
// h_gain/s_gain/v_gain: HSV jitter applied to every output pixel in the
// same pass (pass 1/1/1 to skip — the LUTs become identity-free fast path).
void mosaic4_u8(const uint8_t* s0, const uint8_t* s1, const uint8_t* s2,
                const uint8_t* s3, const int* src_hw, const int* geom,
                uint8_t* dst, int dh, int dw, int cutx, int cuty,
                uint8_t fill, float h_gain, float s_gain, float v_gain) {
  const uint8_t* srcs[4] = {s0, s1, s2, s3};
  // quadrant output regions (x1, y1, x2, y2), tile order 0 TL 1 BL 2 BR 3 TR
  const int regions[4][4] = {
      {0, 0, cutx, cuty}, {0, cuty, cutx, dh}, {cutx, cuty, dw, dh},
      {cutx, 0, dw, cuty}};

  for (int q = 0; q < 4; ++q) {
    const int qx1 = regions[q][0], qy1 = regions[q][1];
    const int qx2 = regions[q][2], qy2 = regions[q][3];
    const int nw = geom[q * 5 + 0], nh = geom[q * 5 + 1];
    const int dx = geom[q * 5 + 2], dy = geom[q * 5 + 3];
    const int flip = geom[q * 5 + 4];
    const int sh = src_hw[q * 2 + 0], sw = src_hw[q * 2 + 1];
    const uint8_t* src = srcs[q];
    // cv2 INTER_LINEAR pixel-center mapping, division hoisted per tile
    const float xr = (float)sw / (float)nw, yr = (float)sh / (float)nh;
    // columns of this quadrant covered by the tile
    const int xs = std::max(qx1, dx), xe = std::min(qx2, dx + nw);

#pragma omp parallel for schedule(static)
    for (int y = qy1; y < qy2; ++y) {
      uint8_t* row = dst + (size_t)y * dw * 3;
      const int ry = y - dy;
      if (ry < 0 || ry >= nh || xs >= xe) {
        std::memset(row + (size_t)qx1 * 3, fill, (size_t)(qx2 - qx1) * 3);
        continue;
      }
      if (xs > qx1) std::memset(row + (size_t)qx1 * 3, fill, (size_t)(xs - qx1) * 3);
      if (qx2 > xe) std::memset(row + (size_t)xe * 3, fill, (size_t)(qx2 - xe) * 3);

      float sy = (ry + 0.5f) * yr - 0.5f;
      sy = std::min(std::max(sy, 0.0f), (float)(sh - 1));
      const int y0 = (int)sy;
      const int y1 = std::min(y0 + 1, sh - 1);
      const float fy = sy - y0;
      const uint8_t* r0p = src + (size_t)y0 * sw * 3;
      const uint8_t* r1p = src + (size_t)y1 * sw * 3;
      for (int x = xs; x < xe; ++x) {
        int rx = x - dx;
        if (flip) rx = nw - 1 - rx;
        float sx = (rx + 0.5f) * xr - 0.5f;
        sx = std::min(std::max(sx, 0.0f), (float)(sw - 1));
        const int x0 = (int)sx;
        const int x1 = std::min(x0 + 1, sw - 1);
        const float fx = sx - x0;
        const float w00 = (1 - fy) * (1 - fx), w01 = (1 - fy) * fx;
        const float w10 = fy * (1 - fx), w11 = fy * fx;
        uint8_t* px = row + (size_t)x * 3;
        for (int c = 0; c < 3; ++c) {
          const float v = w00 * r0p[x0 * 3 + c] + w01 * r0p[x1 * 3 + c] +
                          w10 * r1p[x0 * 3 + c] + w11 * r1p[x1 * 3 + c];
          px[c] = (uint8_t)std::clamp((int)(v + 0.5f), 0, 255);
        }
      }
    }
  }

  // optional HSV jitter over the assembled canvas
  if (h_gain != 1.0f || s_gain != 1.0f || v_gain != 1.0f)
    hsv_jitter_u8(dst, dh, dw, h_gain, s_gain, v_gain);
}

// 0.5/0.5 uint8 blend (reference mixup, dataloader.py:280-288) — one pass,
// no float temporaries.
void blend_half_u8(const uint8_t* a, const uint8_t* b, uint8_t* dst, long n) {
#pragma omp parallel for schedule(static)
  for (long i = 0; i < n; ++i) dst[i] = (uint8_t)(((int)a[i] + (int)b[i]) >> 1);
}

// Batched letterbox: N same-size images -> one contiguous float32 NHWC
// output. The dataloader's collate-free fast path for eval/serving.
void letterbox_batch_u8_to_f32(const uint8_t* src, int n, int sh, int sw,
                               float* dst, int dh, int dw,
                               int nh, int nw, int dx, int dy, float fill) {
#pragma omp parallel for schedule(static)
  for (int i = 0; i < n; ++i) {
    letterbox_u8_to_f32(src + (size_t)i * sh * sw * 3, sh, sw,
                        dst + (size_t)i * dh * dw * 3, dh, dw, nh, nw, dx, dy,
                        fill);
  }
}

}  // extern "C"

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

// In-place HSV jitter on uint8 RGB, matching the reference's LUT semantics
// (dataloader.py:121-133): hue rotated modulo 180 (OpenCV H range), sat/val
// scaled and clipped. Gains: h_gain multiplies H, s_gain S, v_gain V.
void hsv_jitter_u8(uint8_t* img, int h, int w,
                   float h_gain, float s_gain, float v_gain) {
  // Precompute the three LUTs once (256 entries each), like cv2.LUT.
  uint8_t lut_h[256], lut_s[256], lut_v[256];
  for (int i = 0; i < 256; ++i) {
    lut_h[i] = (uint8_t)((int)std::lround(i * h_gain) % 180);
    lut_s[i] = (uint8_t)std::clamp((int)std::lround(i * s_gain), 0, 255);
    lut_v[i] = (uint8_t)std::clamp((int)std::lround(i * v_gain), 0, 255);
  }

#pragma omp parallel for schedule(static)
  for (int y = 0; y < h; ++y) {
    uint8_t* row = img + (size_t)y * w * 3;
    for (int x = 0; x < w; ++x) {
      uint8_t* px = row + x * 3;
      const float r = px[0], g = px[1], b = px[2];
      const float mx = std::max({r, g, b});
      const float mn = std::min({r, g, b});
      const float d = mx - mn;
      // RGB -> HSV (OpenCV uint8 convention: H in [0,180), S/V in [0,255])
      float hh = 0.0f;
      if (d > 0) {
        if (mx == r)
          hh = 60.0f * (g - b) / d;
        else if (mx == g)
          hh = 120.0f + 60.0f * (b - r) / d;
        else
          hh = 240.0f + 60.0f * (r - g) / d;
        if (hh < 0) hh += 360.0f;
      }
      uint8_t H = (uint8_t)std::min(179, (int)(hh * 0.5f + 0.5f));
      uint8_t S = (uint8_t)(mx > 0 ? std::lround(d / mx * 255.0f) : 0);
      uint8_t V = (uint8_t)mx;
      // LUT
      H = lut_h[H];
      S = lut_s[S];
      V = lut_v[V];
      // HSV -> RGB
      const float Hf = H * 2.0f;  // back to degrees
      const float Sf = S / 255.0f;
      const float Vf = (float)V;
      const float C = Vf * Sf;
      const float X = C * (1.0f - std::fabs(std::fmod(Hf / 60.0f, 2.0f) - 1.0f));
      const float m = Vf - C;
      float rf, gf, bf;
      if (Hf < 60)       { rf = C; gf = X; bf = 0; }
      else if (Hf < 120) { rf = X; gf = C; bf = 0; }
      else if (Hf < 180) { rf = 0; gf = C; bf = X; }
      else if (Hf < 240) { rf = 0; gf = X; bf = C; }
      else if (Hf < 300) { rf = X; gf = 0; bf = C; }
      else               { rf = C; gf = 0; bf = X; }
      px[0] = (uint8_t)std::clamp((int)std::lround(rf + m), 0, 255);
      px[1] = (uint8_t)std::clamp((int)std::lround(gf + m), 0, 255);
      px[2] = (uint8_t)std::clamp((int)std::lround(bf + m), 0, 255);
    }
  }
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

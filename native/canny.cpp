// Native host-side Canny edge detector (the TPU framework's C++ analogue of
// the OpenCV C++ Canny the reference calls at src/pipeline.py:205).
//
// Algorithm bit-identical to fastedit_tpu/ops/canny.py (the numpy/JAX golden
// references), which is itself pinned bit-exact against the real cv2 5.0 in
// tests/test_canny_cv2.py: shift-15 fixed-point BT.601 grayscale, integer
// 3x3 Sobel with replicate border, L1 magnitude, cv2's integer 22.5-degree
// sector non-maximum suppression (TG22=13573, strict/non-strict tie rules,
// diagonal picked by the sign bit of gx^gy), floored thresholds compared
// strictly, 8-connected BFS hysteresis.
//
// Exposed as a C ABI for ctypes (no pybind11 in this image):
//   fastedit_canny(rgb_or_gray, h, w, channels, low, high, out_edges)
//
// Build: make -C native   (produces libfastedit_native.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kCannyShift = 15;
constexpr int32_t kTg22 = 13573;  // round(tan(22.5deg) * 2^15)

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" {

// rgb: uint8 [h, w, channels] (channels 1 or 3); out: uint8 [h, w] in {0,255}.
// Returns 0 on success.
int fastedit_canny(const uint8_t* rgb, int h, int w, int channels,
                   float low_threshold, float high_threshold, uint8_t* out) {
  if (h <= 0 || w <= 0 || (channels != 1 && channels != 3)) return 1;
  const int n = h * w;
  int32_t low = static_cast<int32_t>(std::floor(low_threshold));
  int32_t high = static_cast<int32_t>(std::floor(high_threshold));
  if (low > high) std::swap(low, high);

  // 1) grayscale (cv2 shift-15 fixed point).
  std::vector<int32_t> gray(n);
  if (channels == 3) {
    for (int i = 0; i < n; ++i) {
      const uint8_t* p = rgb + 3 * i;
      gray[i] = (9798 * p[0] + 19235 * p[1] + 3735 * p[2] + (1 << 14)) >> 15;
    }
  } else {
    for (int i = 0; i < n; ++i) gray[i] = rgb[i];
  }

  // 2) 3x3 integer Sobel, replicate border; L1 magnitude.
  std::vector<int32_t> gx(n), gy(n), mag(n);
  auto at = [&](int y, int x) -> int32_t {
    return gray[clampi(y, 0, h - 1) * w + clampi(x, 0, w - 1)];
  };
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int32_t fx = (at(y - 1, x + 1) - at(y - 1, x - 1)) +
                         2 * (at(y, x + 1) - at(y, x - 1)) +
                         (at(y + 1, x + 1) - at(y + 1, x - 1));
      const int32_t fy = (at(y + 1, x - 1) - at(y - 1, x - 1)) +
                         2 * (at(y + 1, x) - at(y - 1, x)) +
                         (at(y + 1, x + 1) - at(y - 1, x + 1));
      gx[y * w + x] = fx;
      gy[y * w + x] = fy;
      mag[y * w + x] = std::abs(fx) + std::abs(fy);
    }
  }

  // 3) cv2's integer sector NMS (zero magnitude outside the image).
  auto magz = [&](int y, int x) -> int32_t {
    if (y < 0 || y >= h || x < 0 || x >= w) return 0;
    return mag[y * w + x];
  };
  std::vector<uint8_t> cand(n, 0);
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int i = y * w + x;
      const int32_t m = mag[i];
      if (m <= low) continue;
      const int32_t xs = gx[i], ys = gy[i];
      const int32_t ax = std::abs(xs);
      const int32_t ay = std::abs(ys) << kCannyShift;
      const int32_t tg22x = ax * kTg22;
      bool keep;
      if (ay < tg22x) {
        keep = m > magz(y, x - 1) && m >= magz(y, x + 1);
      } else {
        const int32_t tg67x = tg22x + ((2 * ax) << kCannyShift);
        if (ay > tg67x) {
          keep = m > magz(y - 1, x) && m >= magz(y + 1, x);
        } else {
          const int s = (xs ^ ys) < 0 ? -1 : 1;
          keep = m > magz(y - 1, x - s) && m > magz(y + 1, x + s);
        }
      }
      if (keep) cand[i] = 1;
    }
  }

  // 4) double threshold + 8-connected BFS hysteresis.
  std::memset(out, 0, n);
  std::vector<int> stack;
  stack.reserve(n / 8);
  for (int i = 0; i < n; ++i) {
    if (cand[i] && mag[i] > high && !out[i]) {
      out[i] = 255;
      stack.push_back(i);
      while (!stack.empty()) {
        const int j = stack.back();
        stack.pop_back();
        const int jy = j / w, jx = j % w;
        for (int dy = -1; dy <= 1; ++dy) {
          for (int dx = -1; dx <= 1; ++dx) {
            const int ny = jy + dy, nx = jx + dx;
            if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
            const int k = ny * w + nx;
            if (!out[k] && cand[k]) {
              out[k] = 255;
              stack.push_back(k);
            }
          }
        }
      }
    }
  }
  return 0;
}

}  // extern "C"

// Native host-side Canny edge detector (the TPU framework's C++ analogue of
// the OpenCV C++ Canny the reference calls at src/pipeline.py:205).
//
// Algorithm identical to fastedit_tpu/ops/canny.py (the numpy/JAX golden
// references): BT.601 grayscale, 3x3 Sobel with replicate border, L1
// magnitude, 22.5-degree sector non-maximum suppression, double threshold
// with 8-connected BFS hysteresis.
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

constexpr float kTan22 = 0.4142135623730951f;
constexpr float kTan67 = 2.414213562373095f;

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

  // 1) grayscale (BT.601, rounded like cv2).
  std::vector<float> gray(n);
  if (channels == 3) {
    for (int i = 0; i < n; ++i) {
      const uint8_t* p = rgb + 3 * i;
      gray[i] = std::round(0.299f * p[0] + 0.587f * p[1] + 0.114f * p[2]);
    }
  } else {
    for (int i = 0; i < n; ++i) gray[i] = rgb[i];
  }

  // 2) 3x3 Sobel, replicate border; L1 magnitude.
  std::vector<float> gx(n), gy(n), mag(n);
  auto at = [&](int y, int x) -> float {
    return gray[clampi(y, 0, h - 1) * w + clampi(x, 0, w - 1)];
  };
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const float fx = (at(y - 1, x + 1) - at(y - 1, x - 1)) +
                       2.0f * (at(y, x + 1) - at(y, x - 1)) +
                       (at(y + 1, x + 1) - at(y + 1, x - 1));
      const float fy = (at(y + 1, x - 1) - at(y - 1, x - 1)) +
                       2.0f * (at(y + 1, x) - at(y - 1, x)) +
                       (at(y + 1, x + 1) - at(y - 1, x + 1));
      gx[y * w + x] = fx;
      gy[y * w + x] = fy;
      mag[y * w + x] = std::fabs(fx) + std::fabs(fy);
    }
  }

  // 3) sector NMS (zero-padded neighborhood, matching the JAX/numpy refs).
  std::vector<float> nms(n, 0.0f);
  auto magz = [&](int y, int x) -> float {
    if (y < 0 || y >= h || x < 0 || x >= w) return 0.0f;
    return mag[y * w + x];
  };
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int i = y * w + x;
      const float ax = std::fabs(gx[i]), ay = std::fabs(gy[i]);
      float neighbor;
      if (ay <= ax * kTan22) {
        neighbor = std::fmax(magz(y, x + 1), magz(y, x - 1));
      } else if (ay > ax * kTan67) {
        neighbor = std::fmax(magz(y + 1, x), magz(y - 1, x));
      } else if ((gx[i] >= 0.0f) == (gy[i] >= 0.0f)) {
        // sign() equality in the references treats 0 as its own sign; match
        // exactly below.
        neighbor = std::fmax(magz(y + 1, x + 1), magz(y - 1, x - 1));
      } else {
        neighbor = std::fmax(magz(y + 1, x - 1), magz(y - 1, x + 1));
      }
      // exact sign-match semantics (sign(0) == 0):
      if (!(ay <= ax * kTan22) && !(ay > ax * kTan67)) {
        const float sx = (gx[i] > 0) - (gx[i] < 0);
        const float sy = (gy[i] > 0) - (gy[i] < 0);
        neighbor = (sx == sy) ? std::fmax(magz(y + 1, x + 1), magz(y - 1, x - 1))
                              : std::fmax(magz(y + 1, x - 1), magz(y - 1, x + 1));
      }
      nms[i] = (mag[i] >= neighbor) ? mag[i] : 0.0f;
    }
  }

  // 4) double threshold + 8-connected BFS hysteresis.
  std::memset(out, 0, n);
  std::vector<int> stack;
  stack.reserve(n / 8);
  for (int i = 0; i < n; ++i) {
    if (nms[i] > high_threshold && !out[i]) {
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
            if (!out[k] && nms[k] > low_threshold) {
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

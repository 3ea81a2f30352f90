// Host-side batch stroke rasterizer (C++), the native fast path for the
// data pipeline's offline rasterization.
//
// Implements the exact pixel semantics of the reference python pipeline
// (reference semiSupervised_utils/rasterize.py:131-205): stroke-5 ->
// stroke-3 truncation at the end token, absolute points min/max-normalized
// into [30, 225] (float64 math, int64 trunc), per-stroke Bresenham lines
// skipping row/column zero, then 4-connected binary dilation. The python
// reference (art_sbir_tpu/ops/raster_reference.py) is the test oracle.
//
// Build: g++ -O3 -shared -fPIC -o libraster.so raster.cpp

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kSide = 256;
constexpr double kLo = 30.0, kHi = 225.0;

inline void draw_line(float* canvas, int x0, int y0, int x1, int y1) {
  // classic integer Bresenham, both endpoints included
  int dx = x1 - x0, dy = y1 - y0;
  int xsign = dx > 0 ? 1 : -1;
  int ysign = dy > 0 ? 1 : -1;
  dx = std::abs(dx);
  dy = std::abs(dy);
  int xx, xy, yx, yy;
  if (dx > dy) {
    xx = xsign; xy = 0; yx = 0; yy = ysign;
  } else {
    int t = dx; dx = dy; dy = t;
    xx = 0; xy = ysign; yx = xsign; yy = 0;
  }
  int d = 2 * dy - dx;
  int y = 0;
  for (int x = 0; x <= dx; ++x) {
    int px = x0 + x * xx + y * yx;
    int py = y0 + x * xy + y * yy;
    if (px > 0 && px < kSide && py > 0 && py < kSide) {
      canvas[py * kSide + px] = 255.0f;
    }
    if (d >= 0) {
      y += 1;
      d -= 2 * dx;
    }
    d += 2 * dy;
  }
}

void dilate_cross(const float* in, float* out) {
  for (int y = 0; y < kSide; ++y) {
    for (int x = 0; x < kSide; ++x) {
      bool on = in[y * kSide + x] > 0.0f;
      if (!on && y > 0) on = in[(y - 1) * kSide + x] > 0.0f;
      if (!on && y + 1 < kSide) on = in[(y + 1) * kSide + x] > 0.0f;
      if (!on && x > 0) on = in[y * kSide + x - 1] > 0.0f;
      if (!on && x + 1 < kSide) on = in[y * kSide + x + 1] > 0.0f;
      out[y * kSide + x] = on ? 255.0f : 0.0f;
    }
  }
}

// stroke-5 (t, 5) -> absolute int points + pen flags; returns count
int prepare_points(const float* stroke, int t, int dims,
                   std::vector<int64_t>& px, std::vector<int64_t>& py,
                   std::vector<int>& pen) {
  // stroke-5: find the end token (first row with col4 > 0, index > 0)
  int l = t - 1;
  if (dims == 5) {
    for (int i = 0; i < t; ++i) {
      if (stroke[i * dims + 4] > 0.0f) {
        l = (i == 0) ? t - 1 : i;
        break;
      }
    }
  }
  int n = l + 2;  // + prepended origin
  std::vector<double> ax(n), ay(n);
  ax[0] = 0.0; ay[0] = 0.0;
  pen.assign(n, 0);
  for (int i = 0; i <= l; ++i) {
    ax[i + 1] = ax[i] + stroke[i * dims + 0];
    ay[i + 1] = ay[i] + stroke[i * dims + 1];
    pen[i + 1] = (dims == 5) ? (stroke[i * dims + 3] != 0.0f)
                             : (stroke[i * dims + 2] != 0.0f);
  }
  pen[n - 1] = 1;  // truncation marks the last row as stroke end

  double xmin = ax[0], xmax = ax[0], ymin = ay[0], ymax = ay[0];
  for (int i = 1; i < n; ++i) {
    xmin = std::min(xmin, ax[i]); xmax = std::max(xmax, ax[i]);
    ymin = std::min(ymin, ay[i]); ymax = std::max(ymax, ay[i]);
  }
  double rx = xmax - xmin, ry = ymax - ymin;
  px.resize(n); py.resize(n);
  for (int i = 0; i < n; ++i) {
    px[i] = static_cast<int64_t>((ax[i] - xmin) / rx * (kHi - kLo) + kLo);
    py[i] = static_cast<int64_t>((ay[i] - ymin) / ry * (kHi - kLo) + kLo);
  }
  return n;
}

}  // namespace

extern "C" {

// batch (b, t, dims) float32 strokes -> (b, 256, 256) float32 canvases
void rasterize_batch(const float* strokes, int b, int t, int dims,
                     float* out) {
  std::vector<float> canvas(kSide * kSide);
  std::vector<int64_t> px, py;
  std::vector<int> pen;
  for (int s = 0; s < b; ++s) {
    std::memset(canvas.data(), 0, sizeof(float) * kSide * kSide);
    int n = prepare_points(strokes + (size_t)s * t * dims, t, dims, px, py, pen);
    for (int i = 0; i + 1 < n; ++i) {
      if (pen[i] != 0) continue;  // stroke ends at point i -> no segment
      draw_line(canvas.data(), (int)px[i], (int)py[i], (int)px[i + 1],
                (int)py[i + 1]);
    }
    dilate_cross(canvas.data(), out + (size_t)s * kSide * kSide);
  }
}

}  // extern "C"

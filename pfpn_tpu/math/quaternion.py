"""Batched quaternion / SO(3) algebra in pure JAX.

Conventions (matching the reference implementation's PyBullet semantics,
see /root/reference/envs/utils.py:6-92):

* Quaternions are stored ``(x, y, z, w)`` (PyBullet order). All functions
  broadcast over leading batch dimensions; the quaternion lives in the last
  axis (size 4), vectors in the last axis (size 3).
* ``quat_diff(q0, q1)`` is the *global-frame* difference ``q1 * conj(q0)``
  (PyBullet ``getDifferenceQuaternion`` semantics as used by the reference
  for world-frame angular velocities).
* ``quat_diff_rel(q0, q1)`` is the *local-frame* difference ``conj(q0) * q1``
  (reference ``quatdiff_rel``).
* Euler "zyx" functions follow PyBullet's ``getEulerFromQuaternion``:
  ``q = Rz(yaw) @ Ry(pitch) @ Rx(roll)``, returned as ``(roll, pitch, yaw)``.

Everything here is differentiable and `vmap`/`jit` friendly; no data
dependent control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def quat_identity(shape=()) -> jnp.ndarray:
    q = jnp.zeros(tuple(shape) + (4,))
    return q.at[..., 3].set(1.0)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 in xyzw order (reference utils.py:6-14)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w2 * x1 + x2 * w1 - y2 * z1 + z2 * y1,
            w2 * y1 + x2 * z1 + y2 * w1 - z2 * x1,
            w2 * z1 - x2 * y1 + y2 * x1 + z2 * w1,
            w2 * w1 - x2 * x1 - y2 * y1 - z2 * z1,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, _EPS)


def quat_diff(q0: jnp.ndarray, q1: jnp.ndarray) -> jnp.ndarray:
    """Global-frame difference: rotation taking q0 to q1 in world coords."""
    return quat_multiply(q1, quat_conjugate(q0))


def quat_diff_rel(q0: jnp.ndarray, q1: jnp.ndarray) -> jnp.ndarray:
    """Local-frame difference conj(q0) ⊗ q1 (reference utils.py:22-23)."""
    return quat_multiply(quat_conjugate(q0), q1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (reference utils.py:73-75).

    Uses the expanded form (faster than two quaternion products):
    v' = v + 2 * cross(q.xyz, cross(q.xyz, v) + q.w * v)
    """
    u = q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    u = -q[..., :3]
    w = q[..., 3:4]
    t = 2.0 * jnp.cross(u, v)
    return v + w * t + jnp.cross(u, t)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix from quaternion (reference utils.py:25-26)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def matrix_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (xyzw), branch-free (robust trace form)."""
    # Use the 4-candidate method with where-selection (jit friendly).
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # candidate w-major
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    c0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], -1) / (4.0 * qw0[..., None])
    # candidate x-major
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    c1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / (4.0 * qx1[..., None])
    # candidate y-major
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    c2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], -1) / (4.0 * qy2[..., None])
    # candidate z-major
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    c3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], -1) / (4.0 * qz3[..., None])

    diag = jnp.stack([tr, m00, m11, m22], -1)
    best = jnp.argmax(diag, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], -2)  # (..., 4cand, 4)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from (not necessarily unit) axis and angle.

    A near-zero axis yields the identity quaternion (PyBullet-safe behaviour
    for policy-emitted axis-angle actions, reference deepmimic.py:475).
    """
    axis = jnp.asarray(axis, dtype=jnp.result_type(float))
    angle = jnp.asarray(angle, dtype=axis.dtype)
    n = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    u = axis / jnp.maximum(n, _EPS)
    half = jnp.where(n[..., 0] > _EPS, angle, 0.0)[..., None] * 0.5
    return jnp.concatenate([u * jnp.sin(half), jnp.cos(half)], axis=-1)


def quat_to_axis_angle(q: jnp.ndarray):
    """Shortest-path (axis, angle) with angle in [0, pi].

    Near identity the axis degenerates; we return (1, 0, 0) there
    (PyBullet convention; the angle is ~0 so products axis*angle vanish).
    """
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    v = q[..., :3]
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    s = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(s, w)
    safe = s > _EPS
    axis = jnp.where(
        safe[..., None], v / jnp.maximum(s, _EPS)[..., None],
        jnp.asarray([1.0, 0.0, 0.0], dtype=q.dtype),
    )
    return axis, angle


def quat_log(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (axis * angle), shortest path."""
    axis, angle = quat_to_axis_angle(q)
    return axis * angle[..., None]


def quat_exp(v: jnp.ndarray) -> jnp.ndarray:
    """Quaternion from rotation vector (axis * angle)."""
    angle = jnp.linalg.norm(v, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(half)/angle, safe at 0: -> 0.5
    k = jnp.where(angle > 1e-6, jnp.sin(half) / jnp.maximum(angle, _EPS), 0.5)
    return jnp.concatenate([v * k, jnp.cos(half)], axis=-1)


def quat_slerp(q0: jnp.ndarray, q1: jnp.ndarray, t) -> jnp.ndarray:
    """Spherical interpolation with shortest-path sign fix and lerp fallback."""
    t = jnp.asarray(t)[..., None]
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.maximum(sin_theta, _EPS))
    w1 = jnp.where(use_lerp, t, jnp.sin(t * theta) / jnp.maximum(sin_theta, _EPS))
    return quat_normalize(w0 * q0 + w1 * q1)


def angular_velocity_to_quat_derivative(q: jnp.ndarray, omega_local: jnp.ndarray) -> jnp.ndarray:
    """dq/dt (xyzw) from *local-frame* angular velocity: 0.5 * q ⊗ (ω, 0).

    Note: the reference's ``vel2quat_diff`` (utils.py:58-65) computes the same
    quantity but returns it wxyz-ordered while callers treat it as xyzw — a
    quirk we do not reproduce (see control/spd.py docstring).
    """
    zero = jnp.zeros_like(omega_local[..., :1])
    return 0.5 * quat_multiply(q, jnp.concatenate([omega_local, zero], axis=-1))


def quat_integrate_world(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Exact exp-map integration with world-frame angular velocity."""
    return quat_normalize(quat_multiply(quat_exp(omega_world * dt), q))


def quat_integrate_local(q: jnp.ndarray, omega_local: jnp.ndarray, dt) -> jnp.ndarray:
    """Exact exp-map integration with body/local-frame angular velocity."""
    return quat_normalize(quat_multiply(q, quat_exp(omega_local * dt)))


def quat_to_euler_zyx(q: jnp.ndarray):
    """PyBullet getEulerFromQuaternion: returns (roll, pitch, yaw) with
    q = Rz(yaw) Ry(pitch) Rx(roll)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
    return roll, pitch, yaw


def euler_zyx_to_quat(roll, pitch, yaw) -> jnp.ndarray:
    """Inverse of quat_to_euler_zyx."""
    roll, pitch, yaw = jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw)
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def yaw_about_up(q: jnp.ndarray, up_dir: int = 1) -> jnp.ndarray:
    """Heading angle about the up axis (reference deepmimic.py:760-770).

    For y-up the reference remaps (x, y, z, w) -> (x, -z, y, w) and takes the
    z-yaw of the remapped quaternion.
    """
    if up_dir == 1:
        q = jnp.stack([q[..., 0], -q[..., 2], q[..., 1], q[..., 3]], axis=-1)
    elif up_dir != 2:
        raise ValueError("up_dir must be 1 (y-up) or 2 (z-up)")
    _, _, yaw = quat_to_euler_zyx(q)
    return yaw


def quat_angle(q: jnp.ndarray) -> jnp.ndarray:
    """Shortest rotation angle of a quaternion in [0, pi]."""
    _, angle = quat_to_axis_angle(q)
    return angle

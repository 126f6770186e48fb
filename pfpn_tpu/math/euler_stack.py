"""Spherical <-> stacked-revolute (z,y,x euler) joint conversion.

Rebuild of the reference's decomposed-joint support for humanoid variants
whose spherical joints are modeled as three stacked hinges around z, y, x:

* mocap side (deepmimic.py:193-206): a reference quaternion + local angular
  velocity become three hinge angles (yaw, pitch, roll) and hinge rates;
* reward side (deepmimic.py:659-676): three hinge states compose back into
  one quaternion + local angular velocity for the joint-weighted pose/vel
  error terms.

Dead code for the shipped humanoid (its knees/elbows are single revolutes),
but reference capability — provided here as pure functions usable by any
alternate asset pipeline. Identity verified by round-trip tests
(tests/test_quaternion.py).

Conventions: quaternion q = Rz(yaw) Ry(pitch) Rx(roll) (xyzw order); `w` is
the joint-local angular velocity; hinge order (z, y, x) — the reference's
"stacked in order of around the axis z, y, x".
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from . import quaternion as quat


def spherical_to_stacked_zyx(q: jnp.ndarray, w: jnp.ndarray):
    """(angles (..., 3) in z,y,x hinge order, rates (..., 3) same order).

    The rate decomposition solves  omega_parent = da*z + db*Rz(a)y +
    dc*Rz(a)Ry(b)x  for (da, db, dc). Deviation (PARITY.md): the reference's
    yaw-rate expression (deepmimic.py:203: ((cy*vz+sy*vx)*cz+sy*vy*sz)/cy)
    multiplies the vz term by an extra cos(yaw) — verified numerically to
    NOT invert its own recomposition (deepmimic.py:659-676); the exact
    inverse  da = (cy*vz + sy*(cz*vx + sz*vy))/cy  is used instead."""
    roll, pitch, yaw = quat.quat_to_euler_zyx(q)
    v = quat.quat_rotate(q, w)  # local -> parent frame
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    cy_, sy_ = jnp.cos(pitch), jnp.sin(pitch)
    cz_, sz_ = jnp.cos(yaw), jnp.sin(yaw)
    d_roll = (cz_ * vx + sz_ * vy) / cy_
    d_pitch = cz_ * vy - sz_ * vx
    d_yaw = (cy_ * vz + sy_ * (cz_ * vx + sz_ * vy)) / cy_
    angles = jnp.stack([yaw, pitch, roll], axis=-1)
    rates = jnp.stack([d_yaw, d_pitch, d_roll], axis=-1)
    return angles, rates


# hinge axes in z, y, x order (numpy: no backend init at import time)
_AXES = np.eye(3)[::-1].copy()


def stacked_zyx_to_spherical(angles: jnp.ndarray, rates: jnp.ndarray):
    """Inverse: three hinge (angle, rate) pairs in z,y,x order -> (q, w)
    with w in the composed joint's local frame (deepmimic.py:659-676)."""
    pos = quat.quat_identity(angles.shape[:-1])
    vel = jnp.zeros(angles.shape[:-1] + (3,))
    for i in range(3):
        axis = jnp.broadcast_to(jnp.asarray(_AXES[i], dtype=angles.dtype),
                                angles.shape[:-1] + (3,))
        pos = quat.quat_multiply(
            pos, quat.quat_from_axis_angle(axis, angles[..., i]))
        vel = vel + quat.quat_rotate(pos, rates[..., i, None] * axis)
    w = quat.quat_rotate_inv(pos, vel)
    return pos, w

"""In-jit phase-indexed reference-motion queries.

Replaces the reference's per-query Python frame search + lerp/slerp
(deepmimic.py:160-209) with a gather + slerp over dense device tables —
fully vectorizable over thousands of environments.

The per-env base offset (applied when the motion wraps a cycle and the
reference root is re-synced to the simulated character,
deepmimic.py:146-158, 252-257) is carried as explicit state by the caller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..math import quaternion as quat
from .loader import MotionData


class MotionPose(NamedTuple):
    """Reference pose at a queried time (a full kinematic state)."""

    base_pos: jnp.ndarray    # (3,)
    base_quat: jnp.ndarray   # (4,)
    base_lin: jnp.ndarray    # (3,)
    base_ang: jnp.ndarray    # (3,)
    q_sph: jnp.ndarray       # (n_sph, 4)
    w_sph: jnp.ndarray       # (n_sph, 3)
    q_rev: jnp.ndarray       # (n_rev,)
    w_rev: jnp.ndarray       # (n_rev,)


def sample_pose(motion: MotionData, time: jnp.ndarray) -> MotionPose:
    """Interpolated reference pose at absolute time (wraps over duration)."""
    t = jnp.mod(time, motion.duration)
    t = jnp.where(t < 0, t + motion.duration, t)
    times = jnp.asarray(motion.times)
    n = times.shape[0]
    f0 = jnp.clip(jnp.searchsorted(times, t, side="right") - 1, 0, n - 2)
    f1 = f0 + 1
    t0 = times[f0]
    t1 = times[f1]
    frac = (t - t0) / jnp.maximum(t1 - t0, 1e-8)

    def lerp(tbl):
        tbl = jnp.asarray(tbl)
        return tbl[f0] + frac * (tbl[f1] - tbl[f0])

    q_sph0 = jnp.asarray(motion.q_sph)[f0]
    q_sph1 = jnp.asarray(motion.q_sph)[f1]
    q_sph = jax.vmap(quat.quat_slerp, in_axes=(0, 0, None))(q_sph0, q_sph1, frac)
    base_quat = quat.quat_slerp(
        jnp.asarray(motion.base_quat)[f0], jnp.asarray(motion.base_quat)[f1], frac
    )
    return MotionPose(
        base_pos=lerp(motion.base_pos),
        base_quat=base_quat,
        base_lin=lerp(motion.base_lin),
        base_ang=lerp(motion.base_ang),
        q_sph=q_sph,
        w_sph=lerp(motion.w_sph),
        q_rev=lerp(motion.q_rev),
        w_rev=lerp(motion.w_rev),
    )


def apply_base_offset(
    pose: MotionPose, pos_offset: jnp.ndarray, quat_offset: jnp.ndarray
) -> MotionPose:
    """Apply per-env root offsets (deepmimic.py:252-257)."""
    return pose._replace(
        base_pos=pose.base_pos + pos_offset,
        base_quat=quat.quat_multiply(quat_offset, pose.base_quat),
        base_lin=quat.quat_rotate(quat_offset, pose.base_lin),
        base_ang=quat.quat_rotate(quat_offset, pose.base_ang),
    )


def sync_position_offset(
    motion: MotionData, time: jnp.ndarray, target_base_pos: jnp.ndarray,
    up_dir: int = 1,
) -> jnp.ndarray:
    """New horizontal position offset so the (unoffset) reference root matches
    the simulated root (deepmimic.py:146-151; orientation sync is never used
    by the task env — step passes None, deepmimic.py:540)."""
    raw = sample_pose(motion, time)
    offset = target_base_pos - raw.base_pos
    return offset.at[up_dir].set(0.0)


def mirror_pose(pose: MotionPose, tree, joint_pairs, up_dir: int = 1) -> MotionPose:
    """Left/right mirror of a reference pose (deepmimic.py:217-250, y-up).

    For y-up the lateral axis is z (w=2): base position/linear-velocity z
    negate; quaternion x,y components and angular-velocity x,y negate;
    spherical joint quats/velocities mirror the same way; revolute joints
    negate only when their axis has an x or y component (the knees/elbows
    rotate about z and keep their sign); finally left/right joint channels
    swap (agent.py joint_pairs).
    """
    import numpy as np

    assert up_dir == 1, "mirror implemented for the y-up humanoid"
    neg_w = jnp.array([1.0, 1.0, -1.0])
    neg_quat = jnp.array([-1.0, -1.0, 1.0, 1.0])
    neg_ang = jnp.array([-1.0, -1.0, 1.0])

    q_sph = pose.q_sph * neg_quat[None, :]
    w_sph = pose.w_sph * neg_ang[None, :]
    q_rev = pose.q_rev
    w_rev = pose.w_rev
    motor_index = {nm: i for i, nm in enumerate(tree.motor_names)}
    for m, b in enumerate(tree.motor_bodies):
        if tree.joint_type[b] == 2:  # REVOLUTE
            ax = tree.joint_axis[b]
            if abs(ax[0]) > 1e-9 or abs(ax[1]) > 1e-9:
                r = int(tree.rev_index[b])
                q_rev = q_rev.at[r].multiply(-1.0)
                w_rev = w_rev.at[r].multiply(-1.0)

    # swap left/right channels
    perm_sph = np.arange(tree.n_sph)
    perm_rev = np.arange(tree.n_rev)
    for right, left in joint_pairs:
        br = tree.motor_bodies[motor_index[right]]
        bl = tree.motor_bodies[motor_index[left]]
        if tree.joint_type[br] == 1:  # SPHERICAL
            r, l = int(tree.sph_index[br]), int(tree.sph_index[bl])
            perm_sph[r], perm_sph[l] = perm_sph[l], perm_sph[r]
        else:
            r, l = int(tree.rev_index[br]), int(tree.rev_index[bl])
            perm_rev[r], perm_rev[l] = perm_rev[l], perm_rev[r]

    return MotionPose(
        base_pos=pose.base_pos * neg_w,
        base_quat=pose.base_quat * neg_quat,
        base_lin=pose.base_lin * neg_w,
        base_ang=pose.base_ang * neg_ang,
        q_sph=q_sph[perm_sph],
        w_sph=w_sph[perm_sph],
        q_rev=q_rev[perm_rev],
        w_rev=w_rev[perm_rev],
    )

"""Stable-PD controller in JAX (batched via vmap at a higher level).

Replaces the reference's host-side ``spd_controller`` (envs/utils.py:127-173)
which round-trips through Bullet's C++ CRBA/RNEA every 600 Hz substep. Here
the mass matrix / bias force are shared with the same substep's forward
dynamics (computed once — the reference computes them twice per substep, once
in SPD and once inside stepSimulation).

Semantics relative to the reference:
* identical control law: solve (M + diag(kd) dt) a = kp e_p + kd e_dp - C,
  then tau = kp e_p + kd e_dp - dt kd a (utils.py:161-171), target joint
  velocities are zero (agent.py:284-285);
* spherical position error = axis*angle of the local-frame difference between
  the one-step-predicted joint quaternion and the target (utils.py:146-153).
  We integrate the prediction exactly (exp map); the reference adds an
  unnormalized — and wxyz/xyzw-transposed, see math/quaternion.py — quaternion
  derivative, a numerical quirk we intentionally do not reproduce;
* per-joint torque clamping matches agent.py:317-339 (scalar clip for
  revolute, norm-rescale for spherical).

We work in minimal coordinates (3 dofs per spherical joint); the reference's
quaternion-padded 4th components carry zero gain and zero error, so the two
formulations solve the same linear system.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import cho_solve

from ..math import quaternion as quat
from ..sim.types import KinematicTree, REVOLUTE, SimState


class SPDGains(NamedTuple):
    """Per-dof gain tables (ndof,) with zeros on the floating base dofs."""

    kp: np.ndarray
    kd: np.ndarray


def build_gains(tree: KinematicTree, kp_by_joint: dict, kd_by_joint: dict) -> SPDGains:
    """Expand per-joint-name gain dicts (reference agent.py:178-205) to dofs."""
    kp = np.zeros(tree.ndof)
    kd = np.zeros(tree.ndof)
    for m, b in enumerate(tree.motor_bodies):
        name = tree.motor_names[m]
        d = int(tree.dof_offset[b])
        n = int(tree.dof_count[b])
        kp[d:d + n] = kp_by_joint[name]
        kd[d:d + n] = kd_by_joint[name]
    return SPDGains(kp=kp, kd=kd)


from ..sim.dynamics import f32_precision


def spd_errors(tree: KinematicTree, gains: SPDGains, state: SimState,
               target_sph: jnp.ndarray, target_rev: jnp.ndarray, dt: float):
    """One-step-predicted position/velocity errors per dof (ndof,) each."""
    ndof = tree.ndof
    e_p = jnp.zeros(ndof)
    e_dp = jnp.zeros(ndof)
    for b in tree.motor_bodies:
        d = int(tree.dof_offset[b])
        if tree.joint_type[b] == REVOLUTE:
            r = int(tree.rev_index[b])
            pred = state.q_rev[r] + state.w_rev[r] * dt
            e_p = e_p.at[d].set(target_rev[r] - pred)
            e_dp = e_dp.at[d].set(-state.w_rev[r])
        else:
            s = int(tree.sph_index[b])
            q_pred = quat.quat_integrate_local(state.q_sph[s], state.w_sph[s], dt)
            axis, angle = quat.quat_to_axis_angle(
                quat.quat_diff_rel(q_pred, target_sph[s])
            )
            e_p = e_p.at[d:d + 3].set(axis * angle)
            e_dp = e_dp.at[d:d + 3].set(-state.w_sph[s])
    return e_p, e_dp


def _clamp_motor_slices(tree: KinematicTree, tau: jnp.ndarray):
    """Per-motor torque clamping (agent.py:317-339) on an (ndof,) vector.

    Returns (motor torque list, clamped full vector)."""
    out = []
    clamped = tau
    for mi, b in enumerate(tree.motor_bodies):
        d = int(tree.dof_offset[b])
        lim = float(tree.motor_torque_limit[mi])
        if tree.joint_type[b] == REVOLUTE:
            t = jnp.clip(tau[d:d + 1], -lim, lim)
        else:
            t3 = tau[d:d + 3]
            n = jnp.linalg.norm(t3)
            scale = jnp.where(n > lim, lim / jnp.maximum(n, 1e-9), 1.0)
            t = t3 * scale
        out.append(t)
        clamped = clamped.at[d:d + t.shape[0]].set(t)
    return out, clamped


@f32_precision
def spd_accel(
    tree: KinematicTree,
    gains: SPDGains,
    state: SimState,
    m_spd_inv: jnp.ndarray,      # (ndof, ndof) = (H + diag(kd dt))^-1
    c: jnp.ndarray,              # (ndof,) bias force incl. gravity
    target_sph: jnp.ndarray,
    target_rev: jnp.ndarray,
    dt: float,
):
    """Stable-PD acceleration + clamp correction (solver-free formulation).

    Key identity: with unclamped torques tau = kp e_p + kd e_dp - dt kd a and
    a = (H + diag(kd) dt)^-1 (kp e_p + kd e_dp - C), the resulting forward
    dynamics acceleration H^-1(S tau - C) equals `a` exactly (including the
    unactuated base rows, whose gains are zero) — Stable-PD solves the
    implicit coupled system. The reference solves the same system twice per
    substep (utils.py:161-171 + Bullet's own forward pass); here only the
    torque-limit clamp requires a correction: qdd = a + H^-1 S (tau_clamped -
    tau_unclamped).

    Returns (a, delta_tau) with delta_tau the (ndof,) clamp correction force.
    """
    kp = jnp.asarray(gains.kp, dtype=jnp.float32)
    kd = jnp.asarray(gains.kd, dtype=jnp.float32)
    e_p, e_dp = spd_errors(tree, gains, state, target_sph, target_rev, dt)
    kp_e = kp * e_p
    kd_e = kd * e_dp
    f = kp_e + kd_e - c
    a = m_spd_inv @ f
    tau = kp_e + kd_e - kd * a * dt
    _, tau_clamped = _clamp_motor_slices(tree, tau)
    return a, tau_clamped - tau


@f32_precision
def spd_torques(
    tree: KinematicTree,
    gains: SPDGains,
    state: SimState,
    h: jnp.ndarray,              # (ndof, ndof) mass matrix
    c: jnp.ndarray,              # (ndof,) bias force incl. gravity
    target_sph: jnp.ndarray,     # (n_sph, 4) target joint quaternions
    target_rev: jnp.ndarray,     # (n_rev,) target angles
    dt: float,
) -> List[jnp.ndarray]:
    """Per-motor clamped torques (list in tree.motor_* order)."""
    ndof = tree.ndof
    kp = jnp.asarray(gains.kp, dtype=jnp.float32)
    kd = jnp.asarray(gains.kd, dtype=jnp.float32)

    e_p = jnp.zeros(ndof)
    e_dp = jnp.zeros(ndof)
    for b in tree.motor_bodies:
        d = int(tree.dof_offset[b])
        if tree.joint_type[b] == REVOLUTE:
            r = int(tree.rev_index[b])
            pred = state.q_rev[r] + state.w_rev[r] * dt
            e_p = e_p.at[d].set(target_rev[r] - pred)
            e_dp = e_dp.at[d].set(-state.w_rev[r])
        else:
            s = int(tree.sph_index[b])
            q_pred = quat.quat_integrate_local(state.q_sph[s], state.w_sph[s], dt)
            axis, angle = quat.quat_to_axis_angle(
                quat.quat_diff_rel(q_pred, target_sph[s])
            )
            e_p = e_p.at[d:d + 3].set(axis * angle)
            e_dp = e_dp.at[d:d + 3].set(-state.w_sph[s])

    kp_e = kp * e_p
    kd_e = kd * e_dp
    m = h + jnp.diag(kd * dt)
    f = kp_e + kd_e - c
    a = jnp.linalg.solve(m, f)
    tau = kp_e + kd_e - kd * a * dt

    out: List[jnp.ndarray] = []
    for mi, b in enumerate(tree.motor_bodies):
        d = int(tree.dof_offset[b])
        lim = float(tree.motor_torque_limit[mi])
        if tree.joint_type[b] == REVOLUTE:
            out.append(jnp.clip(tau[d:d + 1], -lim, lim))
        else:
            t3 = tau[d:d + 3]
            n = jnp.linalg.norm(t3)
            scale = jnp.where(n > lim, lim / jnp.maximum(n, 1e-9), 1.0)
            out.append(t3 * scale)
    return out


def clamp_torques(tree: KinematicTree, torques: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """Torque-control-mode clamping (reference agent.py:317-339)."""
    out: List[jnp.ndarray] = []
    for mi, b in enumerate(tree.motor_bodies):
        lim = float(tree.motor_torque_limit[mi])
        t = torques[mi]
        if tree.joint_type[b] == REVOLUTE:
            out.append(jnp.clip(t, -lim, lim))
        else:
            n = jnp.linalg.norm(t)
            scale = jnp.where(n > lim, lim / jnp.maximum(n, 1e-9), 1.0)
            out.append(t * scale)
    return out

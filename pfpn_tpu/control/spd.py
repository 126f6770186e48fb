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

import jax
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


def _motor_dof_tables(tree: KinematicTree):
    """Static scatter indices: spherical dofs (n_sph*3,), revolute dofs (n_rev,),
    ordered by sph/rev index."""
    sph_dofs = np.zeros((tree.n_sph, 3), dtype=np.int64)
    rev_dofs = np.zeros(tree.n_rev, dtype=np.int64)
    for b in tree.motor_bodies:
        d = int(tree.dof_offset[b])
        if tree.joint_type[b] == REVOLUTE:
            rev_dofs[int(tree.rev_index[b])] = d
        else:
            sph_dofs[int(tree.sph_index[b])] = [d, d + 1, d + 2]
    return sph_dofs.reshape(-1), rev_dofs


def spd_errors(tree: KinematicTree, gains: SPDGains, state: SimState,
               target_sph: jnp.ndarray, target_rev: jnp.ndarray, dt: float):
    """One-step-predicted position/velocity errors per dof (ndof,) each.

    All spherical joints are processed in one batched quaternion pass; the
    per-dof layout is restored with static scatter indices (op-count matters:
    this runs every 600 Hz substep)."""
    ndof = tree.ndof
    sph_dofs, rev_dofs = _motor_dof_tables(tree)
    e_p = jnp.zeros(ndof)
    e_dp = jnp.zeros(ndof)
    if tree.n_sph:
        q_pred = quat.quat_integrate_local(state.q_sph, state.w_sph, dt)
        axis, angle = quat.quat_to_axis_angle(
            quat.quat_diff_rel(q_pred, target_sph)
        )
        e_p = e_p.at[sph_dofs].set((axis * angle[:, None]).reshape(-1))
        e_dp = e_dp.at[sph_dofs].set((-state.w_sph).reshape(-1))
    if tree.n_rev:
        pred = state.q_rev + state.w_rev * dt
        e_p = e_p.at[rev_dofs].set(target_rev - pred)
        e_dp = e_dp.at[rev_dofs].set(-state.w_rev)
    return e_p, e_dp


def _motor_limits(tree: KinematicTree):
    """Static per-joint torque limits ordered by sph/rev index."""
    sph_lim = np.zeros(tree.n_sph)
    rev_lim = np.zeros(tree.n_rev)
    for mi, b in enumerate(tree.motor_bodies):
        if tree.joint_type[b] == REVOLUTE:
            rev_lim[int(tree.rev_index[b])] = tree.motor_torque_limit[mi]
        else:
            sph_lim[int(tree.sph_index[b])] = tree.motor_torque_limit[mi]
    return sph_lim, rev_lim


def _clamp_motor_slices(tree: KinematicTree, tau: jnp.ndarray):
    """Per-motor torque clamping (agent.py:317-339) on an (ndof,) vector,
    batched over all spherical/revolute joints at once.

    Returns (None, clamped full vector)."""
    sph_dofs, rev_dofs = _motor_dof_tables(tree)
    sph_lim, rev_lim = _motor_limits(tree)
    clamped = tau
    if tree.n_sph:
        t3 = tau[sph_dofs].reshape(tree.n_sph, 3)
        n = jnp.linalg.norm(t3, axis=-1)
        lim = jnp.asarray(sph_lim, dtype=tau.dtype)
        scale = jnp.where(n > lim, lim / jnp.maximum(n, 1e-9), 1.0)
        clamped = clamped.at[sph_dofs].set((t3 * scale[:, None]).reshape(-1))
    if tree.n_rev:
        lim = jnp.asarray(rev_lim, dtype=tau.dtype)
        clamped = clamped.at[rev_dofs].set(
            jnp.clip(tau[rev_dofs], -lim, lim))
    return None, clamped


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

    Returns (a, delta_tau, tau_clamped): delta_tau is the (ndof,) clamp
    correction force; tau_clamped the applied per-dof torque (the quantity
    the reference's torque-log channel records, deepmimic.py:772-798).
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
    return a, tau_clamped - tau, tau_clamped


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


@f32_precision
def implicit_motor_impulses(
    tree: KinematicTree,
    state: SimState,
    h_inv: jnp.ndarray,          # (ndof, ndof) inverse mass matrix
    v_star: jnp.ndarray,         # (ndof,) predicted pre-constraint velocity
    target_sph: jnp.ndarray,
    target_rev: jnp.ndarray,
    dt: float,
    position_gain: float = 0.3,
    velocity_gain: float = 1.0,
    iterations: int = 16,
    relaxation: float = 1.0,
):
    """Bullet POSITION_CONTROL parity: velocity-level joint motor constraint.

    The reference's non-SPD position mode (agent.py:290-315) calls
    ``setJointMotorControl{2,MultiDof}(POSITION_CONTROL, positionGain=0.3,
    force=torque_lim)``; Bullet realizes that as a btMultiBodyJointMotor
    constraint row per motor dof, solved implicitly with the velocity-level
    target ``dv = kp * (q_t - q)/dt + kd * (0 - v)`` (default velocityGain
    kd=1, targetVelocity 0) and the impulse clamped to ``force * dt``.

    Rebuilt here in generalized coordinates: the motor Jacobian is a dof
    selection matrix, so the Delassus operator is the motor-row submatrix
    of H^-1 and the QP (box for revolute, per-joint L2 ball for spherical —
    matching agent.py:317-339's norm clamp) is solved with the same
    projected-Jacobi / Gershgorin-row-sum iteration as the contact solver
    (sim/contact.py:346-374; sequential Gauss-Seidel measured 17% slower on
    TPU). Deviation from Bullet (PARITY.md #8): motor rows are solved
    *before* — not jointly with — the contact rows of the same substep.

    Returns the (ndof,) impulse vector (zeros on the unactuated base rows);
    apply as ``v += h_inv @ p`` and log torque as ``p / dt``.
    """
    sph_dofs, rev_dofs = _motor_dof_tables(tree)
    sph_lim, rev_lim = _motor_limits(tree)
    m_idx = np.concatenate([sph_dofs, rev_dofs]).astype(np.int64)
    n_s = sph_dofs.shape[0]  # = n_sph * 3

    e = jnp.zeros(tree.ndof)
    if tree.n_sph:
        axis, angle = quat.quat_to_axis_angle(
            quat.quat_diff_rel(state.q_sph, target_sph))
        e = e.at[sph_dofs].set((axis * angle[:, None]).reshape(-1))
    if tree.n_rev:
        e = e.at[rev_dofs].set(target_rev - state.q_rev)

    # desired velocity change on motor rows
    r = (position_gain * e[m_idx] / dt
         - velocity_gain * v_star[m_idx])

    d_mat = h_inv[np.ix_(m_idx, m_idx)]
    rowsum = jnp.sum(jnp.abs(d_mat), axis=1)
    step = relaxation / jnp.maximum(rowsum, 1e-9)

    cap_rev = jnp.asarray(rev_lim, dtype=jnp.float32) * dt
    cap_sph = jnp.asarray(sph_lim, dtype=jnp.float32) * dt

    def project(p):
        if tree.n_sph:
            p3 = p[:n_s].reshape(tree.n_sph, 3)
            n = jnp.linalg.norm(p3, axis=-1)
            scale = jnp.where(n > cap_sph, cap_sph / jnp.maximum(n, 1e-9), 1.0)
            p = p.at[:n_s].set((p3 * scale[:, None]).reshape(-1))
        if tree.n_rev:
            p = p.at[n_s:].set(jnp.clip(p[n_s:], -cap_rev, cap_rev))
        return p

    def body(_, p):
        return project(p + step * (r - d_mat @ p))

    p = jax.lax.fori_loop(0, iterations, body, jnp.zeros(m_idx.shape[0]))
    return jnp.zeros(tree.ndof).at[m_idx].set(p)



"""Reduced-coordinate rigid-body dynamics in pure JAX (Featherstone).

TPU-native replacement for Bullet's C++ ``btMultiBody`` machinery used by the
reference (SURVEY.md §2.2): forward kinematics, CRBA mass matrix
(``calculateMassMatrix``), RNEA bias forces (``calculateInverseDynamics``)
and point Jacobians for the contact solver.

All functions operate on a single environment; batch with ``jax.vmap``.
The kinematic tree is closed over (static): loops over bodies unroll at trace
time (13 bodies for the humanoid), producing straight-line XLA with fixed
shapes — ideal for fusion. Generalized velocity layout:

  v = [base omega (body frame, 3), base linear (body frame, 3),
       per movable joint dofs (spherical: local omega, revolute: rate)]

The base dofs are body-frame spatial coordinates; conversion to/from the
world-frame state representation (Bullet's getBaseVelocity convention)
happens in :func:`pack_velocity` / :func:`unpack_velocity`.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math import quaternion as quat
from .types import FIXED_BASE, FREE, KinematicTree, REVOLUTE, SPHERICAL, SimState


def f32_precision(fn):
    """Pin full float32 matmul precision (TPU MXU defaults to bf16 passes).

    The physics core's small dense algebra (6x6 transforms, 34x34 solves) is
    accuracy-critical; SURVEY.md §7 hard-part 6 — keep physics in fp32.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


class FKResult(NamedTuple):
    """World-frame body kinematics + per-body spatial quantities."""

    body_quat: jnp.ndarray   # (nb, 4) world orientation of each body frame
    body_pos: jnp.ndarray    # (nb, 3) world position of each body origin
    body_rot: jnp.ndarray    # (nb, 3, 3) world rotation matrices
    v: jnp.ndarray           # (nb, 6) spatial velocity, body coords [w; v]
    xup_E: jnp.ndarray       # (nb, 3, 3) parent->body rotation
    xup_r: jnp.ndarray       # (nb, 3) joint origin in parent frame


def _skew(v):
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack([
        jnp.stack([zero, -v[..., 2], v[..., 1]], -1),
        jnp.stack([v[..., 2], zero, -v[..., 0]], -1),
        jnp.stack([-v[..., 1], v[..., 0], zero], -1),
    ], -2)


def _crm(v, u):
    """Spatial cross product (motion): v x u."""
    w, l = v[:3], v[3:]
    uw, ul = u[:3], u[3:]
    return jnp.concatenate([jnp.cross(w, uw), jnp.cross(w, ul) + jnp.cross(l, uw)])


def _crf(v, f):
    """Spatial cross product (force): v x* f."""
    w, l = v[:3], v[3:]
    n, ff = f[:3], f[3:]
    return jnp.concatenate([jnp.cross(w, n) + jnp.cross(l, ff), jnp.cross(w, ff)])


def _xup_matrix(E, r):
    """6x6 motion transform parent->child: [[E, 0], [-E r~, E]]."""
    top = jnp.concatenate([E, jnp.zeros((3, 3))], axis=1)
    bot = jnp.concatenate([-E @ _skew(r), E], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _joint_rel_quat(tree: KinematicTree, state: SimState, i: int):
    """Child-body orientation relative to parent body (static origin ∘ joint)."""
    jq = jnp.asarray(tree.joint_quat[i], dtype=jnp.float32)
    jt = tree.joint_type[i]
    if jt == SPHERICAL:
        qj = state.q_sph[int(tree.sph_index[i])]
    elif jt == REVOLUTE:
        axis = jnp.asarray(tree.joint_axis[i], dtype=jnp.float32)
        qj = quat.quat_from_axis_angle(axis, state.q_rev[int(tree.rev_index[i])])
    else:
        raise ValueError("base body has no relative joint")
    return quat.quat_multiply(jq, qj)


def _joint_motion_subspace(tree: KinematicTree, i: int) -> np.ndarray:
    """S (6, ni) in child coordinates; static."""
    jt = tree.joint_type[i]
    if jt == FREE:
        return np.eye(6)
    if jt == FIXED_BASE:
        return np.zeros((6, 0))
    if jt == SPHERICAL:
        S = np.zeros((6, 3))
        S[:3, :3] = np.eye(3)
        return S
    S = np.zeros((6, 1))
    S[:3, 0] = tree.joint_axis[i]
    return S


def _joint_qdot(tree: KinematicTree, state: SimState, i: int):
    jt = tree.joint_type[i]
    if jt == SPHERICAL:
        return state.w_sph[int(tree.sph_index[i])]
    return state.w_rev[int(tree.rev_index[i])][None]


@f32_precision
def fk(tree: KinematicTree, state: SimState) -> FKResult:
    """Forward kinematics + body-frame spatial velocities."""
    nb = tree.nb
    q_w: List[jnp.ndarray] = [state.base_quat]
    p_w: List[jnp.ndarray] = [state.base_pos]
    R_w: List[jnp.ndarray] = [quat.quat_to_matrix(state.base_quat)]

    # base spatial velocity in body coords (zero for a fixed base)
    if tree.joint_type[0] == FIXED_BASE:
        v0 = jnp.zeros(6)
    else:
        v0 = jnp.concatenate([
            R_w[0].T @ state.base_ang,
            R_w[0].T @ state.base_lin,
        ])
    v: List[jnp.ndarray] = [v0]
    E_list: List[jnp.ndarray] = [jnp.eye(3)]
    r_list: List[jnp.ndarray] = [jnp.zeros(3)]

    for i in range(1, nb):
        p = int(tree.parent[i])
        rel_q = _joint_rel_quat(tree, state, i)
        q_w.append(quat.quat_normalize(quat.quat_multiply(q_w[p], rel_q)))
        r = jnp.asarray(tree.joint_pos[i], dtype=jnp.float32)
        p_w.append(p_w[p] + R_w[p] @ r)
        R_w.append(quat.quat_to_matrix(q_w[i]))
        E = quat.quat_to_matrix(rel_q).T  # parent->child rotation
        E_list.append(E)
        r_list.append(r)

        wp, lp = v[p][:3], v[p][3:]
        vi = jnp.concatenate([E @ wp, E @ (lp + jnp.cross(wp, r))])
        S = jnp.asarray(_joint_motion_subspace(tree, i), dtype=jnp.float32)
        vi = vi + S @ _joint_qdot(tree, state, i)
        v.append(vi)

    return FKResult(
        body_quat=jnp.stack(q_w),
        body_pos=jnp.stack(p_w),
        body_rot=jnp.stack(R_w),
        v=jnp.stack(v),
        xup_E=jnp.stack(E_list),
        xup_r=jnp.stack(r_list),
    )


@f32_precision
def crba(tree: KinematicTree, fkr: FKResult) -> jnp.ndarray:
    """Composite-rigid-body mass matrix H (ndof, ndof), symmetric PD.

    TPU-native equivalent of Bullet ``calculateMassMatrix`` (reference
    envs/utils.py:164-165) in minimal coordinates.
    """
    nb, ndof = tree.nb, tree.ndof
    X = [None] * nb
    for i in range(1, nb):
        X[i] = _xup_matrix(fkr.xup_E[i], fkr.xup_r[i])

    Ic = [jnp.asarray(tree.spatial_inertia[i], dtype=jnp.float32) for i in range(nb)]
    for i in range(nb - 1, 0, -1):
        p = int(tree.parent[i])
        Ic[p] = Ic[p] + X[i].T @ Ic[i] @ X[i]

    H = jnp.zeros((ndof, ndof))
    for i in range(nb - 1, -1, -1):
        S_i = jnp.asarray(_joint_motion_subspace(tree, i), dtype=jnp.float32)
        di = int(tree.dof_offset[i])
        ni = int(tree.dof_count[i])
        if ni == 0:
            continue
        F = Ic[i] @ S_i
        H = H.at[di:di + ni, di:di + ni].set(S_i.T @ F)
        j = i
        while int(tree.parent[j]) >= 0:
            F = X[j].T @ F
            j = int(tree.parent[j])
            nj = int(tree.dof_count[j])
            if nj == 0:
                continue
            S_j = jnp.asarray(_joint_motion_subspace(tree, j), dtype=jnp.float32)
            dj = int(tree.dof_offset[j])
            blk = S_j.T @ F
            H = H.at[dj:dj + nj, di:di + ni].set(blk)
            H = H.at[di:di + ni, dj:dj + nj].set(blk.T)
    return H


@f32_precision
def rnea(
    tree: KinematicTree,
    fkr: FKResult,
    qdd: jnp.ndarray | None = None,
    gravity: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Recursive Newton-Euler inverse dynamics.

    Returns the generalized force tau such that H qdd + C = tau, where C is
    obtained with qdd=None (bias force incl. gravity and velocity products).
    TPU-native equivalent of Bullet ``calculateInverseDynamics``
    (reference envs/utils.py:167).
    """
    nb = tree.nb
    if gravity is None:
        gravity = jnp.array([0.0, -9.8, 0.0])

    X = [None] * nb
    a: List[jnp.ndarray] = [None] * nb
    f: List[jnp.ndarray] = [None] * nb

    # gravity trick: base acceleration = -g (spatial, in base coords)
    a0 = jnp.concatenate([jnp.zeros(3), fkr.body_rot[0].T @ (-gravity)])
    if qdd is not None and int(tree.dof_count[0]) == 6:
        d0 = int(tree.dof_offset[0])
        a0 = a0 + qdd[d0:d0 + 6]
    a[0] = a0
    I0 = jnp.asarray(tree.spatial_inertia[0], dtype=jnp.float32)
    f[0] = I0 @ a[0] + _crf(fkr.v[0], I0 @ fkr.v[0])

    for i in range(1, nb):
        p = int(tree.parent[i])
        X[i] = _xup_matrix(fkr.xup_E[i], fkr.xup_r[i])
        S = jnp.asarray(_joint_motion_subspace(tree, i), dtype=jnp.float32)
        di = int(tree.dof_offset[i])
        ni = int(tree.dof_count[i])
        vJ = fkr.v[i] - (X[i] @ fkr.v[p])  # = S qdot, but cheap to recompute
        ai = X[i] @ a[p] + _crm(fkr.v[i], vJ)
        if qdd is not None:
            ai = ai + S @ qdd[di:di + ni]
        a[i] = ai
        Ii = jnp.asarray(tree.spatial_inertia[i], dtype=jnp.float32)
        f[i] = Ii @ a[i] + _crf(fkr.v[i], Ii @ fkr.v[i])

    tau = jnp.zeros(tree.ndof)
    for i in range(nb - 1, -1, -1):
        di = int(tree.dof_offset[i])
        ni = int(tree.dof_count[i])
        if ni:
            S = jnp.asarray(_joint_motion_subspace(tree, i), dtype=jnp.float32)
            tau = tau.at[di:di + ni].set(S.T @ f[i])
        p = int(tree.parent[i])
        if p >= 0:
            f[p] = f[p] + X[i].T @ f[i]
    return tau


# ---------------------------------------------------------------------------
# velocity packing
# ---------------------------------------------------------------------------

def pack_velocity(tree: KinematicTree, state: SimState, fkr: FKResult) -> jnp.ndarray:
    """State velocities -> generalized velocity vector (ndof,)."""
    parts = [] if tree.joint_type[0] == FIXED_BASE else [fkr.v[0]]
    for i in range(1, tree.nb):
        parts.append(_joint_qdot(tree, state, i))
    return jnp.concatenate(parts)


def _unpack_joint_velocity(tree: KinematicTree, state: SimState, v: jnp.ndarray):
    w_sph = state.w_sph
    w_rev = state.w_rev
    for i in range(1, tree.nb):
        di = int(tree.dof_offset[i])
        if tree.joint_type[i] == SPHERICAL:
            w_sph = w_sph.at[int(tree.sph_index[i])].set(v[di:di + 3])
        else:
            w_rev = w_rev.at[int(tree.rev_index[i])].set(v[di])
    return w_sph, w_rev


@f32_precision
def advance(
    tree: KinematicTree, state: SimState, fkr: FKResult, v_new: jnp.ndarray, dt
) -> SimState:
    """Semi-implicit Euler step: velocities already updated (generalized,
    base part in body coords at time t), integrate positions and re-express
    base velocity in world frame.

    Frame subtlety: the base spatial velocity components are attached to the
    *body* frame (Featherstone body coordinates — the apparent derivative in
    body-fixed coordinates equals the spatial acceleration, RBDA §2.10), so
    the world-frame velocity stored in the state must be produced with the
    *post-step* orientation. Converting with the pre-step rotation silently
    injects an O(dt·ω×v) momentum error per step.
    """
    # Bullet caps multibody coordinate velocities at 100 by default
    # (btMultiBody::maxCoordinateVelocity) — same safety net here.
    v_new = jnp.clip(v_new, -100.0, 100.0)

    if tree.joint_type[0] == FIXED_BASE:
        base_pos = state.base_pos
        base_quat = state.base_quat
        base_ang = jnp.zeros(3)
        base_lin = jnp.zeros(3)
    else:
        w_b = v_new[0:3]
        l_b = v_new[3:6]
        R0 = fkr.body_rot[0]
        base_pos = state.base_pos + dt * (R0 @ l_b)
        base_quat = quat.quat_integrate_local(state.base_quat, w_b, dt)
        R0n = quat.quat_to_matrix(base_quat)
        base_ang = R0n @ w_b
        base_lin = R0n @ l_b

    w_sph, w_rev = _unpack_joint_velocity(tree, state, v_new)
    q_sph = jax.vmap(quat.quat_integrate_local, in_axes=(0, 0, None))(
        state.q_sph, w_sph, dt
    ) if tree.n_sph else state.q_sph
    q_rev = state.q_rev + dt * w_rev if tree.n_rev else state.q_rev

    return state.replace(
        base_pos=base_pos, base_quat=base_quat,
        base_ang=base_ang, base_lin=base_lin,
        q_sph=q_sph, w_sph=w_sph, q_rev=q_rev, w_rev=w_rev,
    )


def apply_joint_torques(tree: KinematicTree, motor_torques: List[jnp.ndarray]) -> jnp.ndarray:
    """Scatter per-motor torques (order = tree.motor_*) into (ndof,)."""
    tau = jnp.zeros(tree.ndof)
    for m, b in enumerate(tree.motor_bodies):
        di = int(tree.dof_offset[b])
        ni = int(tree.dof_count[b])
        tau = tau.at[di:di + ni].set(motor_torques[m])
    return tau


# ---------------------------------------------------------------------------
# link-state reporting (Bullet getLinkState semantics)
# ---------------------------------------------------------------------------

class LinkStates(NamedTuple):
    frame_pos: jnp.ndarray    # (nl, 3) world link (joint) frame position
    frame_quat: jnp.ndarray   # (nl, 4)
    com_pos: jnp.ndarray      # (nl, 3) world CoM position
    com_quat: jnp.ndarray     # (nl, 4)
    lin_vel: jnp.ndarray      # (nl, 3) world CoM linear velocity
    ang_vel: jnp.ndarray      # (nl, 3) world angular velocity


@f32_precision
def link_states(tree: KinematicTree, fkr: FKResult) -> LinkStates:
    """World-frame link states for all reference (URDF) links.

    Mirrors PyBullet ``getLinkState(computeLinkVelocity=1,
    computeForwardKinematics=1)`` as consumed by the reference observation
    and reward code (deepmimic.py:573-592, 691-737).
    """
    b = tree.link_body  # (nl,)
    R_b = fkr.body_rot[b]                      # (nl, 3, 3)
    p_b = fkr.body_pos[b]                      # (nl, 3)
    q_b = fkr.body_quat[b]                     # (nl, 4)
    v_b = fkr.v[b]                             # (nl, 6) body coords

    lp = jnp.asarray(tree.link_pos, dtype=jnp.float32)
    lq = jnp.asarray(tree.link_quat, dtype=jnp.float32)
    ip = jnp.asarray(tree.link_inertial_pos, dtype=jnp.float32)
    iq = jnp.asarray(tree.link_inertial_quat, dtype=jnp.float32)

    frame_pos = p_b + jnp.einsum("lij,lj->li", R_b, lp)
    frame_quat = quat.quat_multiply(q_b, lq)
    R_f = quat.quat_to_matrix(frame_quat)
    com_pos = frame_pos + jnp.einsum("lij,lj->li", R_f, ip)
    com_quat = quat.quat_multiply(frame_quat, iq)

    w_world = jnp.einsum("lij,lj->li", R_b, v_b[:, :3])
    # CoM point offset in body frame
    com_in_body = lp + jnp.einsum("lij,lj->li", quat.quat_to_matrix(lq), ip)
    point_vel_body = v_b[:, 3:] + jnp.cross(v_b[:, :3], com_in_body)
    lin_vel = jnp.einsum("lij,lj->li", R_b, point_vel_body)
    return LinkStates(frame_pos, frame_quat, com_pos, com_quat, lin_vel, w_world)

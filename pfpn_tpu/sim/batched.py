"""Level-batched dynamics: FK + mass matrix + bias force in ~70 XLA ops.

The recursion-based implementations in :mod:`dynamics` unroll per-body loops
into hundreds of tiny ops; per-op overhead made them ~half the substep cost.
This module computes identical quantities with dense batched algebra:

* FK walks the tree by *depth level* (4 levels for the humanoid), one
  batched quaternion op per level;
* body Jacobians in **world-origin spatial coordinates** share one column
  matrix: column d = [a_d; w_d x a_d] (rotational) or [0; a_d] (linear),
  masked per body by static ancestor tables — J_b = mask_b ⊙ Jcols;
* H = sum_b J_b^T I_b^O J_b   (two small einsums; identical to CRBA);
* C = sum_b J_b^T (I_b^O (Jdot v) + v_b x* I_b^O v_b - I_b^O a_g)
  with the column time-derivatives in closed form (identical to RNEA's
  bias force — cross-validated in tests/test_batched.py).

All quantities use the same generalized-velocity layout as dynamics.py
(base body-frame spatial dofs first), so H/C/v are drop-in.
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..math import quaternion as quat
import functools

from .dynamics import FKResult


def _high_precision(fn):
    """3-pass bf16 matmuls (~1e-6 relative): the dense spatial einsums are
    2x cheaper than at 'highest' with no physically meaningful accuracy loss
    (cross-validated against the f64 recursion in tests/test_batched.py)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("high"):
            return fn(*args, **kwargs)

    return wrapper
from .types import FIXED_BASE, FREE, KinematicTree, REVOLUTE, SPHERICAL, SimState


@dataclasses.dataclass(frozen=True)
class BatchedTables:
    levels: Tuple[np.ndarray, ...]       # body indices per tree depth (>0)
    level_parents: Tuple[np.ndarray, ...]
    sph_bodies: np.ndarray               # bodies with spherical joints (sph order)
    rev_bodies: np.ndarray               # bodies with revolute joints (rev order)
    rev_axes: np.ndarray                 # (n_rev, 3) local axes
    joint_quat: np.ndarray               # (nb, 4)
    joint_pos: np.ndarray                # (nb, 3)
    # dof frames
    dof_body: np.ndarray                 # (ndof,)
    dof_axis_local: np.ndarray           # (ndof, 3)
    dof_is_linear: np.ndarray            # (ndof,)
    body_mask: np.ndarray                # (nb, ndof) ancestor mask
    # velocity packing
    sph_dofs: np.ndarray                 # (n_sph*3,)
    rev_dofs: np.ndarray                 # (n_rev,)
    has_free_base: bool


def build_tables(tree: KinematicTree) -> BatchedTables:
    nb = tree.nb
    depth = np.zeros(nb, dtype=np.int64)
    for i in range(1, nb):
        depth[i] = depth[int(tree.parent[i])] + 1
    levels, parents = [], []
    for d in range(1, int(depth.max()) + 1 if nb > 1 else 1):
        idx = np.where(depth == d)[0]
        levels.append(idx)
        parents.append(tree.parent[idx])

    sph_bodies = np.full(tree.n_sph, -1, dtype=np.int64)
    rev_bodies = np.full(tree.n_rev, -1, dtype=np.int64)
    rev_axes = np.zeros((tree.n_rev, 3))
    for i in range(1, nb):
        if tree.joint_type[i] == SPHERICAL:
            sph_bodies[int(tree.sph_index[i])] = i
        elif tree.joint_type[i] == REVOLUTE:
            rev_bodies[int(tree.rev_index[i])] = i
            rev_axes[int(tree.rev_index[i])] = tree.joint_axis[i]

    # dof frames (same layout as contact.build_contact_set)
    dof_body = np.zeros(tree.ndof, dtype=np.int64)
    dof_axis = np.zeros((tree.ndof, 3))
    dof_lin = np.zeros(tree.ndof, dtype=bool)
    sph_dofs = np.zeros(tree.n_sph * 3, dtype=np.int64)
    rev_dofs = np.zeros(tree.n_rev, dtype=np.int64)
    for i in range(nb):
        d = int(tree.dof_offset[i])
        jt = tree.joint_type[i]
        if jt == FREE:
            dof_body[d:d + 6] = i
            dof_axis[d:d + 3] = np.eye(3)
            dof_axis[d + 3:d + 6] = np.eye(3)
            dof_lin[d + 3:d + 6] = True
        elif jt == SPHERICAL:
            dof_body[d:d + 3] = i
            dof_axis[d:d + 3] = np.eye(3)
            s = int(tree.sph_index[i])
            sph_dofs[3 * s:3 * s + 3] = [d, d + 1, d + 2]
        elif jt == REVOLUTE:
            dof_body[d] = i
            dof_axis[d] = tree.joint_axis[i]
            rev_dofs[int(tree.rev_index[i])] = d

    anc = np.zeros((nb, nb), dtype=bool)
    for b in range(nb):
        j = b
        while j >= 0:
            anc[j, b] = True
            j = int(tree.parent[j])
    body_mask = anc[dof_body, :].T.astype(np.float32)  # (nb, ndof)

    return BatchedTables(
        levels=tuple(levels), level_parents=tuple(parents),
        sph_bodies=sph_bodies, rev_bodies=rev_bodies, rev_axes=rev_axes,
        joint_quat=tree.joint_quat, joint_pos=tree.joint_pos,
        dof_body=dof_body, dof_axis_local=dof_axis, dof_is_linear=dof_lin,
        body_mask=body_mask, sph_dofs=sph_dofs, rev_dofs=rev_dofs,
        has_free_base=tree.joint_type[0] == FREE,
    )


class BatchedDynamics(NamedTuple):
    fkr: FKResult            # body_quat/pos/rot + body-frame velocities
    h: jnp.ndarray           # (ndof, ndof)
    c: jnp.ndarray           # (ndof,) bias incl. gravity
    v: jnp.ndarray           # (ndof,) generalized velocity


@_high_precision
def compute(tree: KinematicTree, tb: BatchedTables, state: SimState,
            gravity: jnp.ndarray) -> BatchedDynamics:
    nb, ndof = tree.nb, tree.ndof

    # ---- position FK, level-batched -----------------------------------
    rel = jnp.zeros((nb, 4)).at[:, 3].set(1.0)
    jq = jnp.asarray(tb.joint_quat, dtype=jnp.float32)
    if tree.n_sph:
        rel = rel.at[tb.sph_bodies].set(
            quat.quat_multiply(jq[tb.sph_bodies], state.q_sph))
    if tree.n_rev:
        qj = quat.quat_from_axis_angle(
            jnp.asarray(tb.rev_axes, dtype=jnp.float32), state.q_rev)
        rel = rel.at[tb.rev_bodies].set(
            quat.quat_multiply(jq[tb.rev_bodies], qj))

    q_w = jnp.zeros((nb, 4)).at[:, 3].set(1.0).at[0].set(state.base_quat)
    p_w = jnp.zeros((nb, 3)).at[0].set(state.base_pos)
    jpos = jnp.asarray(tb.joint_pos, dtype=jnp.float32)
    for lvl, par in zip(tb.levels, tb.level_parents):
        qp = q_w[par]
        q_w = q_w.at[lvl].set(
            quat.quat_normalize(quat.quat_multiply(qp, rel[lvl])))
        p_w = p_w.at[lvl].set(p_w[par] + quat.quat_rotate(qp, jpos[lvl]))
    R = quat.quat_to_matrix(q_w)                       # (nb, 3, 3)

    # ---- generalized velocity (same layout as dynamics.pack_velocity) --
    v = jnp.zeros(ndof)
    if tb.has_free_base:
        R0t = R[0].T
        v = v.at[0:3].set(R0t @ state.base_ang)
        v = v.at[3:6].set(R0t @ state.base_lin)
    if tree.n_sph:
        v = v.at[tb.sph_dofs].set(state.w_sph.reshape(-1))
    if tree.n_rev:
        v = v.at[tb.rev_dofs].set(state.w_rev)

    # ---- shared Jacobian columns (world-origin spatial coords) ---------
    axes = jnp.einsum("dij,dj->di", R[tb.dof_body],
                      jnp.asarray(tb.dof_axis_local, dtype=jnp.float32))
    anchors = p_w[tb.dof_body]
    is_lin = jnp.asarray(tb.dof_is_linear)[:, None]
    col_ang = jnp.where(is_lin, 0.0, axes)             # (ndof, 3)
    col_lin = jnp.where(is_lin, axes, jnp.cross(anchors, axes))
    jcols = jnp.concatenate([col_ang, col_lin], axis=1).T   # (6, ndof)
    mask = jnp.asarray(tb.body_mask)                   # (nb, ndof)
    jb = mask[:, None, :] * jcols[None]                # (nb, 6, ndof)

    # ---- world-origin spatial inertia per body -------------------------
    # X (world->body motion transform) = [[E, 0], [-E p~, E]], E = R^T;
    # I_O = X^T I_body X
    zero3 = jnp.zeros((nb, 3, 3))
    px = _skew_batch(p_w)
    E = jnp.swapaxes(R, 1, 2)
    X = jnp.concatenate([
        jnp.concatenate([E, zero3], axis=2),
        jnp.concatenate([-jnp.einsum("bij,bjk->bik", E, px), E], axis=2),
    ], axis=1)                                          # (nb, 6, 6)
    I_body = jnp.asarray(tree.spatial_inertia, dtype=jnp.float32)
    I_O = jnp.einsum("bri,brs,bsj->bij", X, I_body, X)  # (nb, 6, 6)

    # ---- mass matrix ----------------------------------------------------
    ij = jnp.einsum("brs,bsd->brd", I_O, jb)            # (nb, 6, ndof)
    h = jnp.einsum("brd,bre->de", jb, ij)

    # ---- bias force ------------------------------------------------------
    vhat = jnp.einsum("brd,d->br", jb, v)               # (nb, 6) world-origin
    omega = vhat[:, :3]
    # column time derivatives:
    #   rot dof: [w_b x a ; v_anchor x a + w x (w_b x a)]
    #   lin dof: [0 ; w_b x a]
    w_d = omega[tb.dof_body]                            # (ndof, 3)
    vo_d = vhat[tb.dof_body, 3:]                        # origin-point velocity
    v_anchor = vo_d + jnp.cross(w_d, anchors)
    a_dot = jnp.cross(w_d, axes)
    dcol_ang = jnp.where(is_lin, 0.0, a_dot)
    dcol_lin = jnp.where(
        is_lin, a_dot,
        jnp.cross(v_anchor, axes) + jnp.cross(anchors, a_dot),
    )
    djcols = jnp.concatenate([dcol_ang, dcol_lin], axis=1).T  # (6, ndof)
    a_bias = mask[:, None, :] * djcols[None]            # (nb, 6, ndof)
    a_b = jnp.einsum("brd,d->br", a_bias, v)            # Jdot v
    a_g = jnp.concatenate([jnp.zeros(3), gravity])
    f_b = (jnp.einsum("brs,bs->br", I_O, a_b - a_g[None])
           + _crf_batch(vhat, jnp.einsum("brs,bs->br", I_O, vhat)))
    c = jnp.einsum("brd,br->d", jb, f_b)

    # ---- body-frame velocities for reporting ---------------------------
    v_pb = vhat[:, 3:] + jnp.cross(omega, p_w)          # body-origin velocity
    v_body = jnp.concatenate([
        jnp.einsum("bij,bi->bj", R, omega),             # R^T w
        jnp.einsum("bij,bi->bj", R, v_pb),
    ], axis=1)

    fkr = FKResult(
        body_quat=q_w, body_pos=p_w, body_rot=R, v=v_body,
        xup_E=jnp.zeros((nb, 3, 3)), xup_r=jnp.zeros((nb, 3)),
    )
    return BatchedDynamics(fkr=fkr, h=h, c=c, v=v)


def _skew_batch(v):
    zero = jnp.zeros_like(v[:, 0])
    return jnp.stack([
        jnp.stack([zero, -v[:, 2], v[:, 1]], -1),
        jnp.stack([v[:, 2], zero, -v[:, 0]], -1),
        jnp.stack([-v[:, 1], v[:, 0], zero], -1),
    ], -2)


def _crf_batch(v, f):
    """Batched spatial force cross product v x* f; (nb, 6) each."""
    w, l = v[:, :3], v[:, 3:]
    n, ff = f[:, :3], f[:, 3:]
    return jnp.concatenate([
        jnp.cross(w, n) + jnp.cross(l, ff),
        jnp.cross(w, ff),
    ], axis=1)

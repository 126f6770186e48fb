"""Ground-plane collision detection and impulse-based contact solver.

TPU-native replacement for Bullet's sequential-impulse solver as exercised by
the reference (plane ground + humanoid geoms; self-collision disabled —
reference builds the ground at deepmimic.py:382-388 and never enables
self-collision flags in loadURDF).

Design for XLA: a *static* set of candidate contact points is enumerated from
the tree's collision geoms (sphere centers, capsule end caps, box corners).
Every substep all candidates are tested against the plane; inactive ones are
masked. Constraint rows (normal + 2 tangents per point, plus revolute
joint-limit rows) are assembled into a fixed-shape system and solved with a
fixed-iteration *projected Jacobi* sweep: the Delassus matrix A = J H^-1 J^T
is materialized and every row takes a simultaneous step of size
relaxation / (Gershgorin row sum of |A|), which is spectrum-safe for any
contact coupling. A sequential projected Gauss-Seidel variant (Bullet's exact
sequential-impulse scheme, no A matrix, no Gershgorin guard needed) was
implemented and benchmarked — its per-row dependency chain serializes the
TPU VPU and measured 17% slower end-to-end (commit d0ca52a), so the Jacobi
form is the one in use. Do not re-attempt GS without profiling.

Friction uses Bullet's multiplied combination rule: the reference sets lateral
friction 0.9 on both the ground (deepmimic.py:387) and every link
(agent.py:256), giving mu = 0.81.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dynamics import FKResult
from .types import FIXED_BASE, FREE, GEOM_BOX, GEOM_CAPSULE, GEOM_SPHERE, KinematicTree, REVOLUTE, SPHERICAL


@dataclasses.dataclass(frozen=True)
class ContactParams:
    mu: float = 0.81            # combined friction (0.9 * 0.9, Bullet multiply rule)
    erp: float = 0.2            # Baumgarte position-correction factor
    slop: float = 0.001         # penetration slop (m)
    # Fixed sweep count (Bullet's PGS default is 10). The solver is
    # projected *Jacobi* with a Gershgorin row-sum step: plain Jacobi
    # relaxation >= 0.45 diverges for fallen poses with many coupled
    # contacts and NaNs entire training runs (found the hard way — see
    # CLAUDE.md "Physics invariants"), so the per-row step is
    # relaxation / sum_j |A_ij|, which bounds the iteration spectrum for
    # any contact clustering. 16 iterations ~ matches Bullet's resting
    # stack behaviour for the walking contact set.
    iterations: int = 16
    relaxation: float = 1.0     # SOR factor
    # solve only the K deepest candidate points (static shape); walking
    # needs <= 16 (two flat feet = 16 box corners). None = all candidates.
    max_contacts: int | None = 16
    cfm: float = 1e-6           # constraint regularization on diag(A)
    up_dir: int = 1             # index of the up axis (1 = y-up)
    limit_erp: float = 0.2      # joint-limit restitution factor


class ContactSet(NamedTuple):
    """Static candidate-point tables (host NumPy, becomes XLA constants)."""

    body: np.ndarray      # (np,) movable body index per point
    offset: np.ndarray    # (np, 3) point offset in body frame
    radius: np.ndarray    # (np,)
    link: np.ndarray      # (np,) reference link index
    # static dof-frame metadata for Jacobians
    dof_body: np.ndarray  # (ndof,) body owning each dof
    dof_axis_local: np.ndarray  # (ndof, 3) local axis (identity triplets / rev axis)
    dof_is_linear: np.ndarray   # (ndof,) bool
    ancestor_mask: np.ndarray   # (ndof, np) 1 if dof moves point
    # revolute joint-limit metadata
    limit_dof: np.ndarray       # (n_lim,) dof index
    limit_rev: np.ndarray       # (n_lim,) index into q_rev
    limit_value: np.ndarray     # (n_lim,)
    limit_sign: np.ndarray      # (n_lim,) +1 lower, -1 upper


def build_contact_set(tree: KinematicTree) -> ContactSet:
    pts_body, pts_off, pts_rad, pts_link = [], [], [], []

    def _mat(q):
        x, y, z, w = q
        return np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])

    for g in tree.geoms:
        R = _mat(np.asarray(g.quat))
        p = np.asarray(g.pos)
        if g.kind == GEOM_SPHERE:
            pts = [p]
            rad = g.size[0]
        elif g.kind == GEOM_CAPSULE:
            r, hl = g.size
            axis = R @ np.array([0.0, 0.0, 1.0])
            pts = [p + hl * axis, p - hl * axis]
            rad = r
        elif g.kind == GEOM_BOX:
            hx, hy, hz = g.size
            pts = [
                p + R @ np.array([sx * hx, sy * hy, sz * hz])
                for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
            ]
            rad = 0.0
        else:
            raise ValueError("unknown geom")
        for pt in pts:
            pts_body.append(g.body)
            pts_off.append(pt)
            pts_rad.append(rad)
            pts_link.append(g.link)

    n_pts = len(pts_body)

    # dof frames
    dof_body = np.zeros(tree.ndof, dtype=np.int64)
    dof_axis = np.zeros((tree.ndof, 3))
    dof_lin = np.zeros(tree.ndof, dtype=bool)
    for i in range(tree.nb):
        d = int(tree.dof_offset[i])
        if tree.joint_type[i] == FREE:
            dof_body[d:d + 6] = i
            dof_axis[d:d + 3] = np.eye(3)
            dof_axis[d + 3:d + 6] = np.eye(3)
            dof_lin[d + 3:d + 6] = True
        elif tree.joint_type[i] == SPHERICAL:
            dof_body[d:d + 3] = i
            dof_axis[d:d + 3] = np.eye(3)
        elif tree.joint_type[i] == REVOLUTE:
            dof_body[d] = i
            dof_axis[d] = tree.joint_axis[i]
        # FIXED_BASE contributes no dofs

    # ancestor mask: dof d (on body m) moves point k (on body b) iff m is an
    # ancestor-or-self of b.
    anc = np.zeros((tree.nb, tree.nb), dtype=bool)
    for b in range(tree.nb):
        j = b
        while j >= 0:
            anc[j, b] = True
            j = int(tree.parent[j])
    mask = np.zeros((tree.ndof, n_pts))
    for d in range(tree.ndof):
        for k in range(n_pts):
            mask[d, k] = anc[dof_body[d], pts_body[k]]

    # revolute joint limits
    lim_dof, lim_rev, lim_val, lim_sign = [], [], [], []
    for m, b in enumerate(tree.motor_bodies):
        if tree.joint_type[b] == REVOLUTE:
            lo, hi = tree.motor_movement_limit[m]
            if hi > lo:
                d = int(tree.dof_offset[b])
                r = int(tree.rev_index[b])
                lim_dof += [d, d]
                lim_rev += [r, r]
                lim_val += [lo, hi]
                lim_sign += [1.0, -1.0]

    return ContactSet(
        body=np.array(pts_body, dtype=np.int64),
        offset=np.stack(pts_off) if pts_off else np.zeros((0, 3)),
        radius=np.array(pts_rad),
        link=np.array(pts_link, dtype=np.int64),
        dof_body=dof_body,
        dof_axis_local=dof_axis,
        dof_is_linear=dof_lin,
        ancestor_mask=mask,
        limit_dof=np.array(lim_dof, dtype=np.int64),
        limit_rev=np.array(lim_rev, dtype=np.int64),
        limit_value=np.array(lim_val),
        limit_sign=np.array(lim_sign),
    )


def point_positions(cs: ContactSet, fkr: FKResult) -> jnp.ndarray:
    """World positions of all candidate points: (np, 3)."""
    R = fkr.body_rot[cs.body]     # (np, 3, 3)
    p = fkr.body_pos[cs.body]     # (np, 3)
    off = jnp.asarray(cs.offset, dtype=jnp.float32)
    return p + jnp.einsum("kij,kj->ki", R, off)


def point_jacobians(cs: ContactSet, fkr: FKResult, x: jnp.ndarray,
                    mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """J (np, 3, ndof): world point velocity = J @ v_generalized.

    `x` may be a subset of candidate points; pass the matching ancestor
    `mask` (ndof, np) then (defaults to the full static table)."""
    if mask is None:
        mask = jnp.asarray(cs.ancestor_mask, dtype=jnp.float32)
    axes = jnp.einsum(
        "dij,dj->di", fkr.body_rot[cs.dof_body],
        jnp.asarray(cs.dof_axis_local, dtype=jnp.float32),
    )                                             # (ndof, 3) world axes
    anchors = fkr.body_pos[cs.dof_body]           # (ndof, 3)
    diff = x[None, :, :] - anchors[:, None, :]    # (ndof, np, 3)
    j_rot = jnp.cross(axes[:, None, :], diff)     # (ndof, np, 3)
    is_lin = jnp.asarray(cs.dof_is_linear)[:, None, None]
    j = jnp.where(is_lin, axes[:, None, :], j_rot)
    j = j * mask[:, :, None]
    return jnp.transpose(j, (1, 2, 0))            # (np, 3, ndof)


class ContactSolution(NamedTuple):
    dv: jnp.ndarray              # (ndof,) velocity change from impulses
    penetrating: jnp.ndarray     # (np,) bool per candidate point
    link_contact: jnp.ndarray    # (nl,) bool per reference link


class RowSet(NamedTuple):
    """Assembled constraint rows, layout [K normals, K t1, K t2, L limits]."""

    rows: jnp.ndarray            # (n_rows, ndof)
    target: jnp.ndarray          # (n_rows,) desired constraint velocities
    act_n: jnp.ndarray           # (K,) float contact-active mask
    act_l: jnp.ndarray           # (max(L,1),) float limit-active mask
    active_all: jnp.ndarray      # (np_all,) bool per candidate point
    link_contact: jnp.ndarray    # (nl+1,) bool per reference link (+base)


from .dynamics import f32_precision


@f32_precision
def assemble_rows(
    tree: KinematicTree,
    cs: ContactSet,
    params: ContactParams,
    fkr: FKResult,
    q_rev: jnp.ndarray,          # (n_rev,) current revolute angles (for limits)
    dt: float,
) -> RowSet:
    """Everything up to (but excluding) the Delassus solve: candidate test,
    top-K selection, constraint Jacobian rows, Baumgarte targets, masks."""
    n_pts = cs.body.shape[0]
    up = params.up_dir

    x = point_positions(cs, fkr)
    dist_all = x[:, up] - jnp.asarray(cs.radius, dtype=jnp.float32)
    active_all = dist_all < 0.0

    # top-K deepest candidates -> fixed-size active set; Jacobians are only
    # computed for the selected points (the (ndof, np, 3) cross-product
    # tensors dominate row-assembly bandwidth)
    # Jacobians act at the SURFACE contact point (center - radius*up for
    # spheres/capsules; box corners have radius 0) — Bullet's contact point.
    # Using the center would drop the lever arm: friction could not torque a
    # rolling sphere (caught by test_sliding_ball_transitions_to_rolling).
    x_surf = x.at[:, up].add(-jnp.asarray(cs.radius, dtype=jnp.float32))
    if params.max_contacts is not None and params.max_contacts < n_pts:
        k = params.max_contacts
        _, sel = jax.lax.top_k(-dist_all, k)
        dist = dist_all[sel]
        active = active_all[sel]
        mask_sel = jnp.asarray(cs.ancestor_mask, dtype=jnp.float32)[:, sel]
        jp = point_jacobians(cs, fkr, x_surf[sel], mask_sel)
        n_pts = k
    else:
        dist = dist_all
        active = active_all
        jp = point_jacobians(cs, fkr, x_surf)

    # world-frame constraint directions for a static plane (y-up):
    #   normal = up axis; tangents = the two remaining axes (static!)
    axes = [0, 1, 2]
    axes.remove(up)
    t1, t2 = axes
    j_n = jp[:, up, :]                            # (np, ndof)
    j_t1 = jp[:, t1, :]
    j_t2 = jp[:, t2, :]

    # joint-limit rows: unit selector rows in dof space, sign for lower/upper
    n_lim = cs.limit_dof.shape[0]
    if n_lim:
        j_lim = jnp.zeros((n_lim, tree.ndof))
        j_lim = j_lim.at[jnp.arange(n_lim), jnp.asarray(cs.limit_dof)].set(
            jnp.asarray(cs.limit_sign, dtype=jnp.float32)
        )
        theta = q_rev[jnp.asarray(cs.limit_rev)]
        viol = jnp.asarray(cs.limit_sign, dtype=jnp.float32) * (
            jnp.asarray(cs.limit_value, dtype=jnp.float32) - theta
        )  # >0 when violated
        lim_active = (viol > 0.0).astype(jnp.float32)
        lim_bias = params.limit_erp / dt * jnp.maximum(viol, 0.0)
        rows = jnp.concatenate([j_n, j_t1, j_t2, j_lim], axis=0)
    else:
        lim_active = jnp.zeros((1,), dtype=jnp.float32)
        lim_bias = jnp.zeros((0,))
        rows = jnp.concatenate([j_n, j_t1, j_t2], axis=0)

    # desired minimum normal velocity: Baumgarte pushes penetration out
    pen = jnp.maximum(-dist - params.slop, 0.0)
    v_bias_n = params.erp / dt * pen
    target = jnp.concatenate([
        v_bias_n,
        jnp.zeros(n_pts), jnp.zeros(n_pts),
        lim_bias,
    ])

    # per-link contact flags use ALL candidates (termination checks must see
    # every touching link, not just the solved set); slot nl = base link
    nl = tree.link_pos.shape[0]
    link_idx = np.where(cs.link < 0, nl, cs.link)
    link_contact = jnp.zeros(nl + 1, dtype=bool).at[
        jnp.asarray(link_idx)].max(active_all)

    return RowSet(
        rows=rows, target=target,
        act_n=active.astype(jnp.float32), act_l=lim_active,
        active_all=active_all, link_contact=link_contact,
    )


@f32_precision
def solve(
    tree: KinematicTree,
    cs: ContactSet,
    params: ContactParams,
    fkr: FKResult,
    h_inv: jnp.ndarray,          # (ndof, ndof) inverse mass matrix
    v_star: jnp.ndarray,         # (ndof,) pre-constraint velocity
    q_rev: jnp.ndarray,          # (n_rev,) current revolute angles (for limits)
    dt: float,
) -> ContactSolution:
    rs = assemble_rows(tree, cs, params, fkr, q_rev, dt)
    rows, target = rs.rows, rs.target
    n_rows = rows.shape[0]
    n_pts = (params.max_contacts
             if params.max_contacts is not None
             and params.max_contacts < cs.body.shape[0]
             else cs.body.shape[0])
    n_lim = cs.limit_dof.shape[0]

    # W = H^-1 J^T via the precomputed explicit inverse; the Delassus
    # operator is materialized because the Gershgorin step needs |A| row
    # sums. (A sequential Gauss-Seidel variant — Bullet's exact scheme, no A
    # matrix — was implemented and benchmarked: its per-row dependency chain
    # serializes the VPU and measured 17% SLOWER end-to-end than these
    # full-width (R, R, lanes) ops, so the Jacobi form stays.)
    w = jnp.matmul(h_inv, rows.T,
                   precision=jax.lax.Precision.HIGH)  # (ndof, n_rows), 3-pass bf16
    # A only steers the fixed-point iteration (impulses apply through W),
    # so single-pass precision is sufficient and 3x cheaper
    a_mat = jnp.matmul(rows, w, precision=jax.lax.Precision.DEFAULT)
    # spectrum-safe per-row step (see ContactParams.iterations comment)
    rowsum = jnp.sum(jnp.abs(a_mat), axis=1) + params.cfm
    step = params.relaxation / jnp.maximum(rowsum, 1e-9)

    b = rows @ v_star - target

    act_n = rs.act_n
    act_t = act_n
    act_l = rs.act_l
    mu = params.mu

    def body(_, lam):
        upd = lam - step * (a_mat @ lam + b)
        lam_n = jnp.maximum(upd[:n_pts], 0.0) * act_n
        bound = mu * lam_n
        lam_t1 = jnp.clip(upd[n_pts:2 * n_pts], -bound, bound) * act_t
        lam_t2 = jnp.clip(upd[2 * n_pts:3 * n_pts], -bound, bound) * act_t
        parts = [lam_n, lam_t1, lam_t2]
        if n_lim:
            parts.append(jnp.maximum(upd[3 * n_pts:], 0.0) * act_l)
        return jnp.concatenate(parts)

    lam = jax.lax.fori_loop(0, params.iterations, body, jnp.zeros(n_rows))
    dv = w @ lam

    return ContactSolution(dv=dv, penetrating=rs.active_all,
                           link_contact=rs.link_contact)

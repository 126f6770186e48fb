"""Fused substep linear algebra: one Pallas kernel per physics substep.

Profiling on v5e (tools/profile_substep.py) showed the 600 Hz substep is
dominated not by the dynamics recursions (~100 us @ B=1024) but by the chain
of batched small-matrix ops XLA lowers poorly: the SPD inverse pair and its
Newton refine (~430 us), and the contact W/A assembly + 16 PGS matvecs
(~800 us) — each a (B, 34, 34)-ish GEMM at ~180 us plus relayouts.

This module fuses the whole post-dynamics chain into ONE kernel with the
batch in the lane dimension (layout proven by ops/linalg.py): every step is
a short static loop of full-width (rows, lanes) VPU ops, all intermediates
(inverses, W, A) stay in VMEM, and the only HBM traffic is the kernel's
inputs/outputs.

Per environment the kernel computes (Stable-PD + contacts, same math as
engine.substep's default path — reference envs/utils.py:161-171 control law
and the Bullet-style PGS of sim/contact.py):

  Minv = (H + diag(kd dt) + eps)^-1          Gauss-Jordan sweep
  a    = Minv f,  tau = kpe - kd a dt        SPD acceleration
  dtau = clamp_motors(tau) - tau             per-motor torque limits
  Hinv = (H + eps)^-1                        second sweep
  v*   = v + dt (a + Hinv dtau)
  W    = Hinv J^T,  A = J W                  Delassus operator
  lam  = PGS(A, J v* - target)               fixed iterations, friction cone
  v'   = v* + W lam

The public entry :func:`substep_core` is a ``custom_vmap``: unbatched it
runs a plain-JAX reference implementation (Cholesky solves — used on CPU and
in tests); under ``vmap`` on TPU it dispatches the fused kernel.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import cho_factor, cho_solve

_LANES = 128


@dataclasses.dataclass(frozen=True)
class SubstepMeta:
    """Static per-tree data closed over by the kernel."""

    ndof: int
    kd: Tuple[float, ...]              # (ndof,) SPD damping gains
    dt: float
    # motor torque clamps: (start_dof, limit) lists
    sph_motors: Tuple[Tuple[int, float], ...]
    rev_motors: Tuple[Tuple[int, float], ...]
    # contact rows layout: [K normals, K t1, K t2, L limits]
    n_contacts: int
    n_limits: int
    mu: float
    cfm: float
    iterations: int
    relaxation: float
    eps: float = 1e-8                  # diagonal regularizer on H

    @property
    def n_rows(self) -> int:
        return 3 * self.n_contacts + self.n_limits


# ---------------------------------------------------------------------------
# reference (per-env, plain JAX) implementation
# ---------------------------------------------------------------------------

def _clamp_dtau(meta: SubstepMeta, tau: jnp.ndarray) -> jnp.ndarray:
    """clamp(tau) - tau per motor (agent.py:317-339 semantics)."""
    dtau = jnp.zeros_like(tau)
    for d, lim in meta.sph_motors:
        t3 = tau[..., d:d + 3]
        n = jnp.sqrt(jnp.sum(t3 * t3, axis=-1, keepdims=True))
        scale = jnp.where(n > lim, lim / jnp.maximum(n, 1e-9), 1.0)
        dtau = dtau.at[..., d:d + 3].set(t3 * scale - t3)
    for d, lim in meta.rev_motors:
        t = tau[..., d]
        dtau = dtau.at[..., d].set(jnp.clip(t, -lim, lim) - t)
    return dtau


def _pgs_project(meta: SubstepMeta, upd, act_n, act_l):
    k, l = meta.n_contacts, meta.n_limits
    lam_n = jnp.maximum(upd[..., :k], 0.0) * act_n
    bound = meta.mu * lam_n
    lam_t1 = jnp.clip(upd[..., k:2 * k], -bound, bound) * act_n
    lam_t2 = jnp.clip(upd[..., 2 * k:3 * k], -bound, bound) * act_n
    parts = [lam_n, lam_t1, lam_t2]
    if l:
        parts.append(jnp.maximum(upd[..., 3 * k:], 0.0) * act_l)
    return jnp.concatenate(parts, axis=-1)


def _substep_core_reference(meta: SubstepMeta, h, f, kpe, v, rows, target,
                            act_n, act_l):
    n = meta.ndof
    kd = jnp.asarray(meta.kd, dtype=h.dtype)
    eye = jnp.eye(n, dtype=h.dtype)
    m = h + jnp.diag(kd * meta.dt) + meta.eps * eye
    a = cho_solve(cho_factor(m), f)
    tau = kpe - kd * a * meta.dt
    dtau = _clamp_dtau(meta, tau)
    h_ch = cho_factor(h + meta.eps * eye)
    qdd = a + cho_solve(h_ch, dtau)
    v_star = v + meta.dt * qdd

    # projected Jacobi/SOR with the Gershgorin-safe step (sim/contact.py
    # semantics; a sequential-GS variant measured slower on TPU — see the
    # note there)
    w = cho_solve(h_ch, rows.T)                    # (n, R)
    a_mat = rows @ w                               # (R, R)
    rowsum = jnp.sum(jnp.abs(a_mat), axis=1) + meta.cfm
    step = meta.relaxation / jnp.maximum(rowsum, 1e-9)
    b = rows @ v_star - target

    def body(_, lam):
        upd = lam - step * (a_mat @ lam + b)
        return _pgs_project(meta, upd, act_n, act_l)

    lam = jax.lax.fori_loop(0, meta.iterations, body,
                            jnp.zeros(meta.n_rows, dtype=h.dtype))
    return v_star + w @ lam


# ---------------------------------------------------------------------------
# fused Pallas kernel (batch in lanes)
# ---------------------------------------------------------------------------

def _make_kernel(meta: SubstepMeta):
    from jax.experimental import pallas as pl  # noqa: F401 (kernel deps)

    n, r, k_c = meta.ndof, meta.n_rows, meta.n_contacts
    kd_dt = np.asarray(meta.kd, dtype=np.float32) * meta.dt
    kd = np.asarray(meta.kd, dtype=np.float32)

    def sweep(scr):
        """In-place Gauss-Jordan inverse of scr (n, n, T) — ops/linalg.py."""
        for kk in range(n):
            inv_d = 1.0 / scr[kk, kk]
            row_k = scr[kk]
            col_k = scr[:, kk]
            scr[...] = scr[...] - col_k[:, None, :] * (row_k[None, :, :] * inv_d)
            scr[kk, :, :] = row_k * inv_d
            scr[:, kk, :] = col_k * inv_d
            scr[kk, kk, :] = -inv_d
        scr[...] = -scr[...]

    def matvec(mat_ref, vec):
        """(n, n, T) @ (n, T) -> (n, T); contraction as a static loop."""
        acc = mat_ref[:, 0, :] * vec[0][None, :]
        for kk in range(1, n):
            acc = acc + mat_ref[:, kk, :] * vec[kk][None, :]
        return acc

    def kernel(h_ref, f_ref, kpe_ref, v_ref, j_ref, tgt_ref, actn_ref,
               actl_ref, out_ref, m_scr, hinv_scr, w_scr, a_scr):
        t = h_ref.shape[-1]

        # ---- Minv = (H + diag(kd dt) + eps)^-1; a = Minv f --------------
        m_scr[...] = h_ref[...]
        for i in range(n):
            m_scr[i, i, :] = m_scr[i, i, :] + (kd_dt[i] + meta.eps)
        sweep(m_scr)
        a = matvec(m_scr, f_ref[...])

        # ---- torque clamp correction -------------------------------------
        # tau only matters at motor dofs; per-row kd are static Python floats
        # (array constants cannot be captured inside a Pallas kernel body)
        zero_row = jnp.zeros((1, t), dtype=jnp.float32)
        dtau_rows = [zero_row] * n
        for d, lim in meta.sph_motors:
            t3 = jnp.concatenate([
                kpe_ref[d + o][None, :]
                - (float(kd[d + o]) * meta.dt) * a[d + o][None, :]
                for o in range(3)
            ], axis=0)
            nrm = jnp.sqrt(jnp.sum(t3 * t3, axis=0, keepdims=True))
            scale = jnp.where(nrm > lim, lim / jnp.maximum(nrm, 1e-9), 1.0)
            delta = t3 * scale - t3
            for o in range(3):
                dtau_rows[d + o] = delta[o:o + 1]
        for d, lim in meta.rev_motors:
            t1 = (kpe_ref[d][None, :]
                  - (float(kd[d]) * meta.dt) * a[d][None, :])
            dtau_rows[d] = jnp.clip(t1, -lim, lim) - t1
        dtau = jnp.concatenate(dtau_rows, axis=0)

        # ---- Hinv = (H + eps)^-1 (own scratch: `a`/`dtau` reads of m_scr
        # must not race an overwrite); v* -----------------------------------
        hinv_scr[...] = h_ref[...]
        for i in range(n):
            hinv_scr[i, i, :] = hinv_scr[i, i, :] + meta.eps
        sweep(hinv_scr)
        v_star = v_ref[...] + meta.dt * (a + matvec(hinv_scr, dtau))

        # ---- W = Hinv J^T  (n, R, T) --------------------------------------
        w_scr[...] = hinv_scr[:, 0, :][:, None, :] * j_ref[:, 0, :][None, :, :]
        for kk in range(1, n):
            w_scr[...] += hinv_scr[:, kk, :][:, None, :] * j_ref[:, kk, :][None, :, :]

        # ---- A = J W  (R, R, T) -------------------------------------------
        a_scr[...] = j_ref[:, 0, :][:, None, :] * w_scr[0][None, :, :]
        for kk in range(1, n):
            a_scr[...] += j_ref[:, kk, :][:, None, :] * w_scr[kk][None, :, :]

        rowsum = jnp.sum(jnp.abs(a_scr[...]), axis=1) + meta.cfm
        step = meta.relaxation / jnp.maximum(rowsum, 1e-9)
        b = jnp.sum(j_ref[...] * v_star[None, :, :], axis=1) - tgt_ref[...]

        # ---- PGS (projected Jacobi, full-width (R, R, T) ops — a
        # sequential-GS variant measured slower, see sim/contact.py) --------
        act_n = actn_ref[...]
        act_l = actl_ref[...] if meta.n_limits else None
        lam = jnp.zeros((r, t), dtype=jnp.float32)
        for _ in range(meta.iterations):
            alam = jnp.sum(a_scr[...] * lam[None, :, :], axis=1)
            upd = lam - step * (alam + b)
            lam_n = jnp.maximum(upd[:k_c], 0.0) * act_n
            bound = meta.mu * lam_n
            lam_t1 = jnp.clip(upd[k_c:2 * k_c], -bound, bound) * act_n
            lam_t2 = jnp.clip(upd[2 * k_c:3 * k_c], -bound, bound) * act_n
            parts = [lam_n, lam_t1, lam_t2]
            if meta.n_limits:
                parts.append(jnp.maximum(upd[3 * k_c:], 0.0) * act_l)
            lam = jnp.concatenate(parts, axis=0)

        dv = jnp.sum(w_scr[...] * lam[None, :, :], axis=1)
        out_ref[...] = v_star + dv

    return kernel


def _substep_core_pallas(meta: SubstepMeta, h, f, kpe, v, rows, target,
                         act_n, act_l, interpret: bool = False):
    """Batched (B, ...) -> (B, ndof) via the fused kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, r = meta.ndof, meta.n_rows
    b = h.shape[0]
    tile = _LANES if b >= _LANES else b
    pad = (-b) % tile
    if pad:
        eye = jnp.broadcast_to(jnp.eye(n, dtype=h.dtype), (pad, n, n))
        h = jnp.concatenate([h, eye], axis=0)
        zf = jnp.zeros((pad, n), dtype=h.dtype)
        f = jnp.concatenate([f, zf], axis=0)
        kpe = jnp.concatenate([kpe, zf], axis=0)
        v = jnp.concatenate([v, zf], axis=0)
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad, r, n), dtype=h.dtype)], axis=0)
        target = jnp.concatenate(
            [target, jnp.zeros((pad, r), dtype=h.dtype)], axis=0)
        act_n = jnp.concatenate(
            [act_n, jnp.zeros((pad, meta.n_contacts), dtype=h.dtype)], axis=0)
        act_l = jnp.concatenate(
            [act_l, jnp.zeros((pad, max(meta.n_limits, 1)), dtype=h.dtype)],
            axis=0)
    bp = h.shape[0]

    # batch -> lanes
    h_l = jnp.transpose(h, (1, 2, 0))
    f_l = jnp.transpose(f, (1, 0))
    kpe_l = jnp.transpose(kpe, (1, 0))
    v_l = jnp.transpose(v, (1, 0))
    j_l = jnp.transpose(rows, (1, 2, 0))
    tgt_l = jnp.transpose(target, (1, 0))
    actn_l = jnp.transpose(act_n, (1, 0))
    actl_l = jnp.transpose(act_l, (1, 0))

    spec = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape + (tile,), lambda i: (0,) * len(shape) + (i,),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(meta),
        out_shape=jax.ShapeDtypeStruct((n, bp), jnp.float32),
        grid=(bp // tile,),
        in_specs=[spec(n, n), spec(n), spec(n), spec(n), spec(r, n),
                  spec(r), spec(meta.n_contacts), spec(max(meta.n_limits, 1))],
        out_specs=spec(n),
        scratch_shapes=[
            pltpu.VMEM((n, n, tile), jnp.float32),
            pltpu.VMEM((n, n, tile), jnp.float32),
            pltpu.VMEM((n, r, tile), jnp.float32),
            pltpu.VMEM((r, r, tile), jnp.float32),
        ],
        interpret=interpret,
    )(h_l, f_l, kpe_l, v_l, j_l, tgt_l, actn_l, actl_l)
    out = jnp.transpose(out, (1, 0))
    return out[:b] if pad else out


# ---------------------------------------------------------------------------
# public entry: custom_vmap
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def make_substep_core(meta: SubstepMeta):
    """Returns substep_core(h, f, kpe, v, rows, target, act_n, act_l) ->
    v_new with a custom vmap rule dispatching the fused TPU kernel."""

    @jax.custom_batching.custom_vmap
    def substep_core(h, f, kpe, v, rows, target, act_n, act_l):
        return _substep_core_reference(meta, h, f, kpe, v, rows, target,
                                       act_n, act_l)

    @substep_core.def_vmap
    def _vmap_rule(axis_size, in_batched, h, f, kpe, v, rows, target,
                   act_n, act_l):
        args = [h, f, kpe, v, rows, target, act_n, act_l]
        args = [
            jnp.broadcast_to(x, (axis_size,) + x.shape) if not bb else x
            for x, bb in zip(args, in_batched)
        ]
        if jax.default_backend() == "tpu":
            out = _substep_core_pallas(meta, *args)
        else:
            out = jax.vmap(
                lambda *a: _substep_core_reference(meta, *a))(*args)
        return out, True

    return substep_core

"""Simulation engine: one 600 Hz substep and the 20-substep control step.

Replaces Bullet's ``stepSimulation`` loop (reference deepmimic.py:522-543).
Everything — SPD control, forward dynamics, contact resolution, integration —
is one pure function of (state, targets), `vmap`-able over environments and
wrapped in `lax.scan` over substeps. The mass matrix and bias force are
computed once per substep and shared between the SPD solve and forward
dynamics (the reference computes them twice: utils.py:164-167 + Bullet's own
internal pass).
"""

from __future__ import annotations

import dataclasses
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..control.spd import (
    SPDGains, clamp_torques, implicit_motor_impulses, spd_accel, spd_errors,
)
from ..math import quaternion as quat
from ..ops.linalg import spd_inverse_pair
from . import contact as contact_mod
from .contact import ContactParams, ContactSet
from .dynamics import (
    advance, apply_joint_torques, crba, fk, link_states, pack_velocity, rnea,
)
from .types import KinematicTree, REVOLUTE, SimState


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    dt: float = 1.0 / 600.0
    frame_skip: int = 20
    gravity: Tuple[float, float, float] = (0.0, -9.8, 0.0)
    contact: ContactParams = dataclasses.field(default_factory=ContactParams)
    control_mode: str = "spd"   # "spd" | "torque" | "position"
    # level-batched FK/H/C (sim/batched.py): ~5x fewer XLA ops, identical
    # results; on the current v5e backend the recursion's elementwise ops
    # outperform the batched small GEMMs at the B~1024 sweet spot, so the
    # recursion stays default. The batched path is the feedstock for a
    # future fused Pallas substep kernel.
    fast_dynamics: bool = False
    # fuse the entire post-dynamics linear algebra (Stable-PD solve, torque
    # clamp correction, Delassus assembly, PGS) into one Pallas kernel with
    # the batch in the lane dimension (ops/substep_lin.py). Used for SPD
    # control mode; identical math to the unfused path (cross-validated in
    # tests/test_fused.py). Off on CPU automatically (custom_vmap fallback).
    fused: bool = True
    # fuse the ENTIRE control step (FK, dynamics, SPD, contacts, integration
    # x frame_skip substeps) into one Pallas kernel (ops/megastep.py) —
    # eliminates the per-substep XLA launch soup. SPD mode only; env.step
    # uses it via control_step_full. Off on CPU automatically.
    megastep: bool = True
    # additionally emit the final link states from inside the kernel
    # (megastep.py emit_links), letting env.step skip its XLA-side
    # fk+link_states epilogue. Equivalence-tested; default off pending an
    # A/B benchmark on real hardware (PFPN_MEGASTEP_LINKS=1 overrides).
    # Measured r4 (results/bench_links_tpu.log): on=154.3k vs off=151.1k
    # sim steps/s, +0.4% policy-in-loop — inside run-to-run variance, so
    # the simpler default stays off.
    megastep_links: bool = False


class Engine:
    """Binds a kinematic tree + config into jit-friendly step functions.

    The instance is a host-side container of static data; its methods are
    pure functions of traced state.
    """

    def __init__(self, tree: KinematicTree, config: EngineConfig, gains: Optional[SPDGains] = None):
        self.tree = tree
        self.config = config
        self.gains = gains
        self.contact_set: ContactSet = contact_mod.build_contact_set(tree)
        if config.fast_dynamics:
            from .batched import build_tables
            self.batched_tables = build_tables(tree)
        else:
            self.batched_tables = None
        self._substep_core = None
        if config.fused and config.control_mode == "spd" and gains is not None:
            self._substep_core = self._build_substep_core()
        self.mega = None
        self.mega_links = None
        if (config.megastep and self._substep_core is not None):
            from ..ops.megastep import build_meta, make_megastep
            meta = build_meta(
                tree, gains, config.contact, self.contact_set,
                config.dt, config.frame_skip, config.gravity)
            self.mega = make_megastep(
                meta, self.contact_set.ancestor_mask,
                self._substep_fused_core_full)
            import os
            if config.megastep_links or os.environ.get(
                    "PFPN_MEGASTEP_LINKS", "") not in ("", "0"):
                self.mega_links = make_megastep(
                    meta, self.contact_set.ancestor_mask,
                    self._substep_fused_core_full,
                    link_state_fn=lambda st: link_states(tree, fk(tree, st)))

    def _build_substep_core(self):
        from ..ops.substep_lin import SubstepMeta, make_substep_core

        tree, cfg = self.tree, self.config
        sph_motors, rev_motors = [], []
        for m, b in enumerate(tree.motor_bodies):
            d = int(tree.dof_offset[b])
            lim = float(tree.motor_torque_limit[m])
            if tree.joint_type[b] == REVOLUTE:
                rev_motors.append((d, lim))
            else:
                sph_motors.append((d, lim))
        n_cand = self.contact_set.body.shape[0]
        k = (cfg.contact.max_contacts
             if cfg.contact.max_contacts is not None
             and cfg.contact.max_contacts < n_cand else n_cand)
        meta = SubstepMeta(
            ndof=tree.ndof,
            kd=tuple(float(x) for x in self.gains.kd),
            dt=cfg.dt,
            sph_motors=tuple(sph_motors),
            rev_motors=tuple(rev_motors),
            n_contacts=int(k),
            n_limits=int(self.contact_set.limit_dof.shape[0]),
            mu=cfg.contact.mu,
            cfm=cfg.contact.cfm,
            iterations=cfg.contact.iterations,
            relaxation=cfg.contact.relaxation,
        )
        return make_substep_core(meta)

    # -- one 600 Hz physics substep -------------------------------------
    def substep(
        self,
        state: SimState,
        target_sph: jnp.ndarray,
        target_rev: jnp.ndarray,
        torque_motors: Optional[List[jnp.ndarray]] = None,
        return_torque: bool = False,
    ) -> Tuple[SimState, jnp.ndarray]:
        """Advance dt. Returns (state', link_contact_flags (nl,) bool), plus
        the applied per-dof torque (ndof,) when return_torque (the torque-log
        diagnostic channel, reference deepmimic.py:772-798 — runs the unfused
        path, which is cross-validated against the fused kernels)."""
        tree, cfg = self.tree, self.config
        dt = cfg.dt

        if self._substep_core is not None and not return_torque:
            return self._substep_fused(state, target_sph, target_rev)

        fkr, h, c, v = self._dynamics(state)

        # one fused kernel inverts both (H + diag(kd dt)) for Stable-PD and
        # H for forward dynamics + contacts (ops/linalg.py)
        eye = jnp.eye(tree.ndof)
        if cfg.control_mode == "spd":
            kd = jnp.asarray(self.gains.kd, dtype=jnp.float32)
            pair = jnp.stack([h + jnp.diag(kd * dt) + 1e-8 * eye,
                              h + 1e-8 * eye])
            invs = spd_inverse_pair(pair)
            m_spd_inv, h_inv = invs[0], invs[1]
            a, dtau, tau_applied = spd_accel(
                tree, self.gains, state, m_spd_inv, c,
                target_sph, target_rev, dt,
            )
            # Stable-PD identity: unclamped-torque dynamics accelerate at
            # exactly `a`; only the torque clamp needs an H^-1 correction
            qdd = a + h_inv @ dtau
        elif cfg.control_mode == "position":
            # Bullet POSITION_CONTROL servo (agent.py:290-315): unforced
            # dynamics first, then the implicit velocity-level motor
            # constraint on the predicted velocity (control/spd.py)
            from ..ops.linalg import spd_inverse
            h_inv = spd_inverse(h + 1e-8 * eye)
            v_pred = v + dt * (h_inv @ (-c))
            p = implicit_motor_impulses(
                tree, state, h_inv, v_pred, target_sph, target_rev, dt)
            tau_applied = p / dt
            v_star = v_pred + h_inv @ p
        else:
            from ..ops.linalg import spd_inverse
            h_inv = spd_inverse(h + 1e-8 * eye)
            motor_tau = clamp_torques(tree, torque_motors)
            tau_applied = apply_joint_torques(tree, motor_tau)
            qdd = h_inv @ (tau_applied - c)
        if cfg.control_mode != "position":
            v_star = v + dt * qdd

        sol = contact_mod.solve(
            tree, self.contact_set, cfg.contact, fkr, h_inv, v_star,
            state.q_rev, dt,
        )
        v_new = v_star + sol.dv

        state = advance(tree, state, fkr, v_new, dt)
        state = self._clamp_limits(state)
        if return_torque:
            return state, sol.link_contact, tau_applied
        return state, sol.link_contact

    def _dynamics(self, state: SimState):
        """(fkr, H, C, v) via the recursion or the level-batched path."""
        tree, cfg = self.tree, self.config
        gravity = jnp.asarray(cfg.gravity, dtype=jnp.float32)
        if cfg.fast_dynamics:
            from .batched import compute as batched_compute
            bd = batched_compute(tree, self.batched_tables, state, gravity)
            return bd.fkr, bd.h, bd.c, bd.v
        fkr = fk(tree, state)
        h = crba(tree, fkr)
        c = rnea(tree, fkr, gravity=gravity)
        v = pack_velocity(tree, state, fkr)
        return fkr, h, c, v

    def _substep_fused_core(self, state: SimState, target_sph, target_rev):
        """SPD substep through the fused Pallas core (ops/substep_lin.py).
        Returns (state', RowSet)."""
        tree, cfg = self.tree, self.config
        dt = cfg.dt
        fkr, h, c, v = self._dynamics(state)
        e_p, e_dp = spd_errors(tree, self.gains, state, target_sph,
                               target_rev, dt)
        kp = jnp.asarray(self.gains.kp, dtype=jnp.float32)
        kd = jnp.asarray(self.gains.kd, dtype=jnp.float32)
        kpe = kp * e_p + kd * e_dp
        rs = contact_mod.assemble_rows(
            tree, self.contact_set, cfg.contact, fkr, state.q_rev, dt)
        v_new = self._substep_core(
            h, kpe - c, kpe, v, rs.rows, rs.target, rs.act_n, rs.act_l)
        state = advance(tree, state, fkr, v_new, dt)
        state = self._clamp_limits(state)
        return state, rs

    def _substep_fused(self, state: SimState, target_sph, target_rev):
        state, rs = self._substep_fused_core(state, target_sph, target_rev)
        return state, rs.link_contact

    def _substep_fused_core_full(self, state: SimState, target_sph,
                                 target_rev):
        """(state', active_all, base_pos) — the megastep reference substep."""
        state, rs = self._substep_fused_core(state, target_sph, target_rev)
        return state, rs.active_all, state.base_pos

    # -- one full control step through the megastep kernel ----------------
    def control_step_full(self, state: SimState, target_sph, target_rev):
        """(state', active_all (n_cand,) bool, base_hist (frame_skip, 3)).

        One fused kernel on TPU (ops/megastep.py); scan of fused substeps
        elsewhere. Requires SPD mode with megastep enabled."""
        assert self.mega is not None, "megastep not enabled"
        return self.mega(state, target_sph, target_rev)

    def control_step_links(self, state: SimState, target_sph, target_rev):
        """control_step_full + final LinkStates emitted by the kernel
        (EngineConfig.megastep_links / PFPN_MEGASTEP_LINKS=1)."""
        assert self.mega_links is not None, "megastep_links not enabled"
        return self.mega_links(state, target_sph, target_rev)

    def link_contact_from_active(self, active: jnp.ndarray) -> jnp.ndarray:
        """Map per-candidate contact flags to per-link flags (+base slot)."""
        nl = self.tree.link_pos.shape[0]
        link_idx = np.where(self.contact_set.link < 0, nl,
                            self.contact_set.link)
        return jnp.zeros(nl + 1, dtype=bool).at[
            jnp.asarray(link_idx)].max(active)

    def _clamp_limits(self, state: SimState) -> SimState:
        # safety clamp on revolute limits (impulse rows handle dynamics;
        # this prevents slow positional drift past the stops)
        tree = self.tree
        if not tree.n_rev:
            return state
        lo = np.full(tree.n_rev, -np.inf)
        hi = np.full(tree.n_rev, np.inf)
        for m, b in enumerate(tree.motor_bodies):
            if tree.joint_type[b] == REVOLUTE:
                l, u = tree.motor_movement_limit[m]
                if u > l:
                    lo[int(tree.rev_index[b])] = l
                    hi[int(tree.rev_index[b])] = u
        q_rev = jnp.clip(state.q_rev, jnp.asarray(lo, dtype=jnp.float32),
                         jnp.asarray(hi, dtype=jnp.float32))
        return state.replace(q_rev=q_rev)

    # -- one 30 Hz control step (frame_skip substeps) --------------------
    def control_step(
        self,
        state: SimState,
        target_sph: jnp.ndarray,
        target_rev: jnp.ndarray,
        torque_motors: Optional[List[jnp.ndarray]] = None,
    ) -> Tuple[SimState, jnp.ndarray]:
        """Scan frame_skip substeps.

        Returns (state', link_contact (nl,)) where link_contact reflects the
        *last* substep only — matching the reference, which queries Bullet's
        contact points after the frame_skip loop (deepmimic.py:545-546), and
        getContactPoints reports the most recent stepSimulation.
        """

        def body(carry, _):
            st, _ = carry
            st, lc = self.substep(st, target_sph, target_rev, torque_motors)
            return (st, lc), None

        nl = self.tree.link_pos.shape[0] + 1  # +1: base-link slot
        (state, contacts), _ = jax.lax.scan(
            body, (state, jnp.zeros(nl, dtype=bool)), None,
            length=self.config.frame_skip,
        )
        return state, contacts

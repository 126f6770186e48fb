"""DeepMimic humanoid imitation tasks as pure JAX functions.

TPU-native rebuild of the reference task env (envs/deepmimic.py:345-821):
``step`` fuses SPD control, 20 physics substeps, phase-wrap reference
re-sync, contact-based early termination, the 5-term imitation reward and
the 197-dim observation into one pure function of (state, action, key) —
`vmap`-able over thousands of humanoids and `jit`-compiled end to end.

Parity notes (file:line cite the reference):
* control 30 Hz, physics 600 Hz (deepmimic.py:355-357);
* action space & normalization incl. DeepMimic's z-offset quirk for
  spherical joints (deepmimic.py:420-464);
* reference-state initialization with random phase + ground-penetration
  lift (deepmimic.py:486-505);
* observation layout (deepmimic.py:555-592) — including the reference's
  behaviour of appending the *unrotated* world linear velocity while the
  angular velocity is heading-rotated (deepmimic.py:583-589);
* reward weights/scales (deepmimic.py:594-753);
* TimeLimit truncation at 20 s after the RSI start phase
  (deepmimic.py:549-550).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..control.spd import build_gains
from ..math import quaternion as quat
from ..mocap import MotionData, load_motion, sample_pose, apply_base_offset, sync_position_offset
from ..sim import Engine, EngineConfig, SimState, zero_state
from ..sim import contact as contact_mod
from ..sim.dynamics import f32_precision, fk, link_states
from ..sim.types import KinematicTree, REVOLUTE
from .assets import HUMANOID_KD, HUMANOID_KP, humanoid_tree

UP = 1  # y-up


@struct.dataclass
class EnvState:
    sim: SimState
    elapsed_time: jnp.ndarray     # ()
    init_time: jnp.ndarray        # ()
    ref_pos_offset: jnp.ndarray   # (3,) cycle-wrap root offset


class StepResult(NamedTuple):
    state: EnvState
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray         # terminal OR truncated
    terminated: jnp.ndarray   # true terminal (fall)
    truncated: jnp.ndarray    # TimeLimit


# reward constants (deepmimic.py:598-617)
_SCALES = {"pose": 2.0, "vel": 0.1, "end_eff": 40.0, "root": 5.0, "com": 10.0}
_WEIGHTS_RAW = {"pose": 0.5, "vel": 0.05, "end_eff": 0.15, "root": 0.2, "com": 0.1}
_WSUM = sum(_WEIGHTS_RAW.values())
_WEIGHTS = {k: v / _WSUM for k, v in _WEIGHTS_RAW.items()}
_JOINT_W_RAW = {
    "base": 1.0, "chest": 0.5, "head": 0.3,
    "right_thign": 0.5, "right_shin": 0.3, "right_foot": 0.2,
    "right_upper_arm": 0.3, "right_forearm": 0.2,
    "left_thign": 0.5, "left_shin": 0.3, "left_foot": 0.2,
    "left_upper_arm": 0.3, "left_forearm": 0.2,
}
_JWSUM = sum(_JOINT_W_RAW.values())
JOINT_WEIGHTS = {k: v / _JWSUM for k, v in _JOINT_W_RAW.items()}


class DeepMimicEnv:
    """Host-side container binding tree + motion + engine into pure fns."""

    def __init__(
        self,
        motion: str = "walk",
        control_mode: str = "spd",
        fps: float = 30.0,
        frame_skip: int = 20,
        random_init_pose: bool = True,
        overtime: float = 20.0,
        control_range: float = 4.0,
        contact_params=None,
        exact_ref_reward: bool = False,
    ):
        self.tree: KinematicTree = humanoid_tree()
        self.motion_name = motion
        self.motion: MotionData = load_motion(self.tree, motion)
        self.fps = fps
        self.frame_skip = frame_skip
        self.dt = 1.0 / (fps * frame_skip)
        self.random_init_pose = random_init_pose
        self.overtime = overtime
        self.exact_ref_reward = exact_ref_reward
        self.control_range = control_range
        self.control_mode = control_mode

        cfg = EngineConfig(
            dt=self.dt, frame_skip=frame_skip, control_mode=control_mode,
            **({"contact": contact_params} if contact_params else {}),
        )
        gains = build_gains(self.tree, HUMANOID_KP, HUMANOID_KD)
        self.engine = Engine(self.tree, cfg, gains=gains)

        self._build_action_space()
        self._build_static_tables()
        self.observation_size = 2 + 15 * 7 + 15 * 6
        self.action_size = len(self.action_mean)

    # -- static tables ---------------------------------------------------
    def _build_action_space(self):
        """Action normalization tables (deepmimic.py:420-464)."""
        tree = self.tree
        mean, std, lo, hi = [], [], [], []
        if self.control_mode in ("spd", "position"):
            for m, b in enumerate(tree.motor_bodies):
                l, u = tree.motor_movement_limit[m]
                if tree.joint_type[b] == REVOLUTE:
                    mean.append(0.5 * (u + l))
                    std.append((u - l) * 0.5 * self.control_range)
                    lo.append(-1.0)
                    hi.append(1.0)
                else:
                    y_off, z_off = 0.0, 0.2  # y-up (deepmimic.py:434-437)
                    mean.extend([0.0, y_off, z_off, 0.0])
                    std.extend([1.0, 1.0, 1.0, (u - l) * 0.5 * self.control_range])
                    lo.extend([-1.0, -1.0 - y_off, -1.0 - z_off, -1.0])
                    hi.extend([1.0, 1.0 - y_off, 1.0 - z_off, 1.0])
        else:  # torque
            for m, b in enumerate(tree.motor_bodies):
                lim = tree.motor_torque_limit[m]
                n = 1 if tree.joint_type[b] == REVOLUTE else 3
                mean.extend([0.0] * n)
                std.extend([lim] * n)
                lo.extend([-1.0] * n)
                hi.extend([1.0] * n)
        self.action_mean = np.array(mean, dtype=np.float32)
        self.action_std = np.array(std, dtype=np.float32)
        self.action_low = np.array(lo, dtype=np.float32)
        self.action_high = np.array(hi, dtype=np.float32)

    def _build_static_tables(self):
        tree = self.tree
        # links allowed to touch the ground (motion's ContactableBodies)
        allowed = np.zeros(len(tree.link_names), dtype=bool)
        if self.motion.contactable_links is not None:
            for nm in self.motion.contactable_links:
                allowed[tree.link_index(nm)] = True
            self.has_termination = True
        else:
            self.has_termination = False
        self.contact_allowed = allowed

        # end effectors: childless links minus head/neck (agent.py:28-48, 247-250)
        children = set(tree.link_parent.tolist())
        ee = [i for i in range(len(tree.link_names)) if i not in children]
        for nm in ("head", "neck"):
            if nm in tree.link_names and tree.link_index(nm) in ee:
                ee.remove(tree.link_index(nm))
        self.end_effectors = np.array(ee, dtype=np.int64)

        # per-link reward weights by joint group (deepmimic.py:608-617)
        self.group_links = []  # (link_index, weight, is_spherical, sph/rev idx)
        from ..mocap.loader import LINK_TO_JOINT
        motor_index = {nm: i for i, nm in enumerate(tree.motor_names)}
        for link_name, joint_name in LINK_TO_JOINT.items():
            mi = motor_index[joint_name]
            b = tree.motor_bodies[mi]
            w = JOINT_WEIGHTS[link_name]
            if tree.joint_type[b] == REVOLUTE:
                self.group_links.append((link_name, w, False, int(tree.rev_index[b])))
            else:
                self.group_links.append((link_name, w, True, int(tree.sph_index[b])))

        self.link_mass = tree.link_mass.astype(np.float32)
        if not self.exact_ref_reward:  # tables are dead on the exact path
            self._build_ref_tables()

    def _build_ref_tables(self):
        """Dense phase-indexed reference-FK tables.

        The reward's reference-side FK quantities — heading-local
        end-effector positions and CoM velocity — are invariant to the
        cycle-wrap root offset (the offset is horizontal and cancels in
        ``rp - base_pos``; heights pass through the heading rotation
        unchanged; the offset rotation is always identity,
        deepmimic.py:536-541), so they are pure functions of motion phase.
        Precomputing them at 600 Hz resolution removes one full-tree FK pass
        per control step from the hot loop (reference recomputes it per
        query: deepmimic.py:259-339, 626).
        """
        n = max(int(round(self.motion.duration * 600.0)),
                2 * len(np.asarray(self.motion.times)))
        ts = np.linspace(0.0, float(self.motion.duration), n + 1)

        mass = jnp.asarray(self.link_mass)[:, None]
        msum = float(self.link_mass.sum())
        ee_idx = jnp.asarray(self.end_effectors)
        up_vec = jnp.zeros(3).at[UP].set(1.0)

        @f32_precision
        def at_time(t):
            pose = sample_pose(self.motion, t)
            ref_sim = self._sim_from_pose(pose)
            ls = link_states(self.tree, fk(self.tree, ref_sim))
            heading = quat.yaw_about_up(pose.base_quat, UP)
            rot = quat.quat_to_matrix(
                quat.quat_from_axis_angle(up_vec, -heading))
            rp = ls.frame_pos[ee_idx]
            ref_rel = rp - pose.base_pos
            ref_rel = ref_rel.at[:, UP].set(rp[:, UP])
            ee_local = ref_rel @ rot.T
            com_vel = jnp.sum(mass * ls.lin_vel, axis=0) / msum
            return ee_local, com_vel

        ee_tbl, com_tbl = jax.vmap(at_time)(jnp.asarray(ts, dtype=jnp.float32))
        self.ref_ee_local = np.asarray(jax.device_get(ee_tbl))
        self.ref_com_vel = np.asarray(jax.device_get(com_tbl))
        self.n_ref_samples = n

    def _ref_tables_at(self, time: jnp.ndarray):
        """Lerp (ee_local (n_ee,3), com_vel (3,)) from the dense tables."""
        t = jnp.mod(time, self.motion.duration)  # non-negative for dur > 0
        x = t / self.motion.duration * self.n_ref_samples
        i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, self.n_ref_samples - 1)
        frac = x - i0.astype(jnp.float32)
        ee = jnp.asarray(self.ref_ee_local)
        com = jnp.asarray(self.ref_com_vel)
        ee_local = ee[i0] * (1.0 - frac) + ee[i0 + 1] * frac
        com_vel = com[i0] * (1.0 - frac) + com[i0 + 1] * frac
        return ee_local, com_vel

    # -- helpers ---------------------------------------------------------
    def unnormalize_action(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(self.action_mean) + a * jnp.asarray(self.action_std)

    def _action_to_targets(self, action: jnp.ndarray):
        """Unnormalized action -> SPD targets / torques (deepmimic.py:466-478)."""
        tree = self.tree
        t_sph = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
        t_rev = jnp.zeros(tree.n_rev)
        torques = []
        i = 0
        for m, b in enumerate(tree.motor_bodies):
            if self.control_mode in ("spd", "position"):
                if tree.joint_type[b] == REVOLUTE:
                    t_rev = t_rev.at[int(tree.rev_index[b])].set(action[i])
                    i += 1
                else:
                    q = quat.quat_from_axis_angle(action[i:i + 3], action[i + 3])
                    t_sph = t_sph.at[int(tree.sph_index[b])].set(q)
                    i += 4
            else:
                n = 1 if tree.joint_type[b] == REVOLUTE else 3
                torques.append(action[i:i + n])
                i += n
        return t_sph, t_rev, (torques if self.control_mode == "torque" else None)

    def _sim_from_pose(self, pose) -> SimState:
        return zero_state(self.tree).replace(
            base_pos=pose.base_pos,
            base_quat=quat.quat_normalize(pose.base_quat),
            base_lin=pose.base_lin,
            base_ang=pose.base_ang,
            q_sph=quat.quat_normalize(pose.q_sph),
            w_sph=pose.w_sph,
            q_rev=pose.q_rev,
            w_rev=pose.w_rev,
        )

    def phase(self, state: EnvState) -> jnp.ndarray:
        p = jnp.mod(state.elapsed_time / self.motion.duration, 1.0)
        return jnp.where(p < 0, p + 1.0, p)

    # -- reset -----------------------------------------------------------
    @f32_precision
    def reset(self, key: jax.Array) -> Tuple[EnvState, jnp.ndarray]:
        """Reference-state initialization (deepmimic.py:480-513)."""
        if self.random_init_pose:
            ph = jax.random.uniform(key)
        else:
            ph = jnp.zeros(())
        init_time = ph * self.motion.duration
        pose = sample_pose(self.motion, init_time)
        sim = self._sim_from_pose(pose)

        # ground-penetration lift (deepmimic.py:497-505)
        fkr = fk(self.tree, sim)
        cs = self.engine.contact_set
        x = contact_mod.point_positions(cs, fkr)
        dist = jnp.min(x[:, UP] - jnp.asarray(cs.radius, dtype=jnp.float32)) - 0.001
        lift = jnp.where(dist < 0, -dist, 0.0)
        sim = sim.replace(base_pos=sim.base_pos.at[UP].add(lift))

        state = EnvState(
            sim=sim,
            elapsed_time=init_time,
            init_time=init_time,
            ref_pos_offset=jnp.zeros(3),
        )
        # the lift is a pure UP-translation, so the lifted pose's link
        # states are the pre-lift ones with positions shifted (rotations
        # and material-point velocities are translation-invariant) —
        # observe() reuses this FK instead of running a second one. This
        # matters because step_autoreset computes reset_batch every step.
        ls = link_states(self.tree, fkr)
        ls = ls._replace(frame_pos=ls.frame_pos.at[:, UP].add(lift),
                         com_pos=ls.com_pos.at[:, UP].add(lift))
        return state, self.observe(state, ls=ls)

    # -- step ------------------------------------------------------------
    @f32_precision
    def step(self, state: EnvState, action: jnp.ndarray) -> StepResult:
        action = self.unnormalize_action(action)
        t_sph, t_rev, torques = self._action_to_targets(action)
        duration = self.motion.duration

        ls_kernel = None
        if self.engine.mega is not None and torques is None:
            # one fused kernel for the whole control step (ops/megastep.py);
            # the phase-wrap re-sync (deepmimic.py:536-541) is reconstructed
            # from the per-substep base-position history: the wrap happens at
            # most once per control step, at a closed-form substep index
            if self.engine.mega_links is not None:
                # the kernel also emits the final link states, replacing
                # the fk+link_states epilogue below (megastep_links)
                sim, active, hist, ls_kernel = self.engine.control_step_links(
                    state.sim, t_sph, t_rev)
            else:
                sim, active, hist = self.engine.control_step_full(
                    state.sim, t_sph, t_rev)
            last_contact = self.engine.link_contact_from_active(active)
            e0 = state.elapsed_time
            elapsed = e0 + self.frame_skip * self.dt
            n1 = jnp.floor(elapsed / duration)
            wrapped_any = n1 > jnp.floor(e0 / duration)
            t_wrap = n1 * duration
            s_star = jnp.clip(
                jnp.ceil((t_wrap - e0) / self.dt - 1e-6).astype(jnp.int32) - 1,
                0, self.frame_skip - 1,
            )
            e_star = e0 + (s_star + 1).astype(jnp.float32) * self.dt
            new_off = sync_position_offset(
                self.motion, e_star, hist[s_star], UP)
            off = jnp.where(wrapped_any, new_off, state.ref_pos_offset)
        else:
            def substep(carry, _):
                sim, elapsed, off = carry
                sim, link_contact = self.engine.substep(sim, t_sph, t_rev, torques)
                new_elapsed = elapsed + self.dt
                # phase wrap -> re-sync reference root to simulated root
                # (deepmimic.py:536-541)
                wrapped = jnp.mod(new_elapsed, duration) < jnp.mod(elapsed, duration)
                new_off = sync_position_offset(self.motion, new_elapsed, sim.base_pos, UP)
                off = jnp.where(wrapped, new_off, off)
                return (sim, new_elapsed, off), link_contact

            (sim, elapsed, off), contacts = jax.lax.scan(
                substep, (state.sim, state.elapsed_time, state.ref_pos_offset),
                None, length=self.frame_skip,
            )
            last_contact = contacts[-1]

        state = EnvState(
            sim=sim, elapsed_time=elapsed,
            init_time=state.init_time, ref_pos_offset=off,
        )

        if self.has_termination:
            allowed = np.concatenate([self.contact_allowed, [False]])  # base slot
            bad = jnp.logical_and(last_contact, ~jnp.asarray(allowed))
            terminated = jnp.any(bad)
        else:
            terminated = jnp.zeros((), dtype=bool)

        # one shared FK/link-state pass feeds both reward and observation
        # (the reference recomputes link states per consumer through Bullet
        # getters; VERDICT r2: two redundant FK passes per control step);
        # with megastep_links the kernel already emitted them
        ls = (ls_kernel if ls_kernel is not None
              else link_states(self.tree, fk(self.tree, sim)))
        reward = self.reward(state, terminated, ls=ls)
        truncated = jnp.logical_and(
            ~terminated,
            elapsed >= self.overtime + state.init_time,
        )
        done = jnp.logical_or(terminated, truncated)
        return StepResult(state, self.observe(state, ls=ls), reward, done,
                          terminated, truncated)

    # -- torque-log diagnostic channel (deepmimic.py:401-414, 772-798) ----
    @f32_precision
    def step_log(self, state: EnvState, action: jnp.ndarray):
        """Like step() but also returns the applied per-dof torque history
        (frame_skip, ndof) — the reference's info["log"]["torque"] channel.
        Uses the unfused substep (diagnostics, not the hot path); convert to
        the reference's named dict with torque_log()."""
        action = self.unnormalize_action(action)
        t_sph, t_rev, torques = self._action_to_targets(action)
        duration = self.motion.duration

        def substep(carry, _):
            sim, elapsed, off = carry
            sim, link_contact, tau = self.engine.substep(
                sim, t_sph, t_rev, torques, return_torque=True)
            new_elapsed = elapsed + self.dt
            wrapped = jnp.mod(new_elapsed, duration) < jnp.mod(elapsed, duration)
            new_off = sync_position_offset(self.motion, new_elapsed, sim.base_pos, UP)
            off = jnp.where(wrapped, new_off, off)
            return (sim, new_elapsed, off), (link_contact, tau)

        (sim, elapsed, off), (contacts, tau_hist) = jax.lax.scan(
            substep, (state.sim, state.elapsed_time, state.ref_pos_offset),
            None, length=self.frame_skip,
        )
        last_contact = jax.tree.map(lambda x: x[-1], contacts)

        state = EnvState(
            sim=sim, elapsed_time=elapsed,
            init_time=state.init_time, ref_pos_offset=off,
        )
        if self.has_termination:
            allowed = np.concatenate([self.contact_allowed, [False]])
            bad = jnp.logical_and(last_contact, ~jnp.asarray(allowed))
            terminated = jnp.any(bad)
        else:
            terminated = jnp.zeros((), dtype=bool)
        ls = link_states(self.tree, fk(self.tree, sim))
        reward = self.reward(state, terminated, ls=ls)
        truncated = jnp.logical_and(
            ~terminated, elapsed >= self.overtime + state.init_time)
        done = jnp.logical_or(terminated, truncated)
        res = StepResult(state, self.observe(state, ls=ls), reward, done,
                         terminated, truncated)
        return res, tau_hist

    @property
    def torque_channels(self):
        """Named per-dof channels in the reference's scheme: revolute joints
        log under their name, spherical under name_{x,y,z}
        (deepmimic.py:404-412)."""
        tree = self.tree
        channels = []
        for m, b in enumerate(tree.motor_bodies):
            d = int(tree.dof_offset[b])
            name = tree.motor_names[m]
            if int(tree.joint_type[b]) == REVOLUTE:
                channels.append((name, d))
            else:
                for i, ax in enumerate("xyz"):
                    channels.append((f"{name}_{ax}", d + i))
        return channels

    def torque_log(self, tau_hist) -> dict:
        """Host-side: (.., frame_skip, ndof) torque history -> the
        reference's named-channel dict (info["log"]["torque"])."""
        hist = np.asarray(tau_hist)
        return {name: hist[..., d] for name, d in self.torque_channels}

    # -- observation (deepmimic.py:555-592) -------------------------------
    @f32_precision
    def observe(self, state: EnvState, ls: Optional[object] = None) -> jnp.ndarray:
        tree = self.tree
        sim = state.sim
        if ls is None:
            ls = link_states(tree, fk(tree, sim))

        base_pos = sim.base_pos
        base_height = base_pos[UP]
        heading = quat.yaw_about_up(sim.base_quat, UP)
        up_vec = jnp.zeros(3).at[UP].set(1.0)
        inv_head = quat.quat_from_axis_angle(up_vec, -heading)
        rot = quat.quat_to_matrix(inv_head)
        origin = base_pos.at[UP].set(0.0)

        pos = (ls.com_pos - origin) @ rot.T
        pos = pos.at[:, UP].add(-base_height)
        orient = quat.quat_multiply(inv_head[None, :], ls.com_quat)
        # base link (pelvis, lid 0) records its world orientation un-rotated
        orient = orient.at[0].set(ls.com_quat[0])
        orient = jnp.where(orient[:, 3:4] < 0, -orient, orient)

        lin_vel = ls.lin_vel                      # world frame (reference quirk)
        ang_vel = ls.ang_vel @ rot.T              # heading-local

        pos_state = jnp.concatenate(
            [base_height[None]]
            + [jnp.concatenate([pos[i], orient[i]]) for i in range(15)]
        )
        vel_state = jnp.concatenate(
            [jnp.concatenate([lin_vel[i], ang_vel[i]]) for i in range(15)]
        )
        return jnp.concatenate([self.phase(state)[None], pos_state, vel_state])

    # -- reward (deepmimic.py:594-753) ------------------------------------
    @f32_precision
    def _reward_errors(self, state: EnvState,
                       ls: Optional[object] = None) -> dict:
        """The five raw imitation error terms (pre exp/weighting), shared by
        reward() and the diagnostic reward_terms()."""
        tree = self.tree
        sim = state.sim

        ref = apply_base_offset(
            sample_pose(self.motion, state.elapsed_time),
            state.ref_pos_offset, jnp.array([0.0, 0.0, 0.0, 1.0]),
        )
        if ls is None:
            ls = link_states(tree, fk(tree, sim))
        if self.exact_ref_reward:
            # exact per-step reference FK (testing/validation path; the
            # default interpolates the dense tables — see _build_ref_tables)
            ref_ls = link_states(tree, fk(tree, self._sim_from_pose(ref)))
        else:
            ref_ls = None

        up_vec = jnp.zeros(3).at[UP].set(1.0)

        # base terms
        dq = quat.quat_diff(sim.base_quat, ref.base_quat)
        pose_err = JOINT_WEIGHTS["base"] * quat.quat_angle(dq) ** 2
        dv = jnp.linalg.norm(sim.base_ang - ref.base_ang)
        vel_err = JOINT_WEIGHTS["base"] * dv ** 2

        # joint terms
        for link_name, w, is_sph, idx in self.group_links:
            if is_sph:
                dqj = quat.quat_diff(sim.q_sph[idx], ref.q_sph[idx])
                dp = quat.quat_angle(dqj)
                dvj = jnp.linalg.norm(sim.w_sph[idx] - ref.w_sph[idx])
            else:
                dp = sim.q_rev[idx] - ref.q_rev[idx]
                dvj = sim.w_rev[idx] - ref.w_rev[idx]
            pose_err = pose_err + w * dp ** 2
            vel_err = vel_err + w * dvj ** 2

        # end-effector term (heading-local, height kept absolute)
        heading = quat.yaw_about_up(sim.base_quat, UP)
        rot = quat.quat_to_matrix(quat.quat_from_axis_angle(up_vec, -heading))

        ee = self.end_effectors
        p = ls.frame_pos[ee]
        rel = p - sim.base_pos
        rel = rel.at[:, UP].set(p[:, UP])
        if ref_ls is None:
            ref_ee_local, ref_com_vel = self._ref_tables_at(state.elapsed_time)
        else:
            ref_heading = quat.yaw_about_up(ref.base_quat, UP)
            ref_rot = quat.quat_to_matrix(
                quat.quat_from_axis_angle(up_vec, -ref_heading))
            rp = ref_ls.frame_pos[ee]
            ref_rel = rp - ref.base_pos
            ref_rel = ref_rel.at[:, UP].set(rp[:, UP])
            ref_ee_local = ref_rel @ ref_rot.T
        d = rel @ rot.T - ref_ee_local
        end_err = jnp.sum(d * d) / len(ee)

        # root term
        root_pos_err = jnp.sum((sim.base_pos - ref.base_pos) ** 2)
        root_rot_err = quat.quat_angle(dq) ** 2
        root_vel_err = jnp.sum((sim.base_lin - ref.base_lin) ** 2)
        root_ang_err = jnp.sum((sim.base_ang - ref.base_ang) ** 2)
        root_err = (root_pos_err + 0.1 * root_rot_err
                    + 0.01 * root_vel_err + 0.001 * root_ang_err)

        # CoM velocity term
        m = jnp.asarray(self.link_mass)[:, None]
        com_vel = jnp.sum(m * ls.lin_vel, axis=0) / self.link_mass.sum()
        if ref_ls is not None:
            ref_com_vel = jnp.sum(m * ref_ls.lin_vel, axis=0) / self.link_mass.sum()
        com_err = 0.1 * jnp.sum((com_vel - ref_com_vel) ** 2)

        return {"pose": pose_err, "vel": vel_err, "end_eff": end_err,
                "root": root_err, "com": com_err}

    @f32_precision
    def reward(self, state: EnvState, terminated,
               ls: Optional[object] = None) -> jnp.ndarray:
        e = self._reward_errors(state, ls)
        reward = (
            _WEIGHTS["pose"] * jnp.exp(-_SCALES["pose"] * e["pose"])
            + _WEIGHTS["vel"] * jnp.exp(-_SCALES["vel"] * e["vel"])
            + _WEIGHTS["end_eff"] * jnp.exp(-_SCALES["end_eff"] * e["end_eff"])
            + _WEIGHTS["root"] * jnp.exp(-_SCALES["root"] * e["root"])
            + _WEIGHTS["com"] * jnp.exp(-_SCALES["com"] * e["com"])
        )
        return jnp.where(terminated, 0.0, reward)

    def reward_terms(self, state: EnvState, terminated,
                     ls: Optional[object] = None) -> dict:
        """Diagnostic: the five weighted exp-of-error components; their sum
        equals reward() exactly (tools/reward_term_replay.py)."""
        e = self._reward_errors(state, ls)
        return {k: jnp.where(terminated, 0.0,
                             _WEIGHTS[k] * jnp.exp(-_SCALES[k] * e[k]))
                for k in _WEIGHTS}

    # -- batched API ------------------------------------------------------
    def reset_batch(self, keys: jax.Array):
        return jax.vmap(self.reset)(keys)

    def step_batch(self, states: EnvState, actions: jnp.ndarray) -> StepResult:
        return jax.vmap(self.step)(states, actions)

    def step_autoreset(self, states: EnvState, actions: jnp.ndarray, keys: jax.Array):
        """Batched step with in-jit auto-reset on done (SURVEY.md §7.5).

        Returns (new_states, new_obs, StepResult): StepResult.obs/reward/done
        come from the *pre-reset* transition (standard RL semantics);
        new_states/new_obs are re-initialized where done.
        """
        res = self.step_batch(states, actions)
        reset_states, reset_obs = self.reset_batch(keys)

        def pick(r, n):
            return jnp.where(res.done.reshape((-1,) + (1,) * (n.ndim - 1)), r, n)

        new_states = jax.tree.map(pick, reset_states, res.state)
        new_obs = pick(reset_obs, res.obs)
        return new_states, new_obs, res


def make(env_name: str, **kwargs) -> "DeepMimicEnv":
    """gym.make-style constructor: DeepMimic{Walk,Punch,Kick}-v0, plus the
    TPU-native multi-task batch DeepMimicMultiTask-v0 (envs/multitask.py)."""
    name = env_name
    if name.endswith("-v0"):
        name = name[:-3]
    if not name.startswith("DeepMimic"):
        raise ValueError(f"unknown env {env_name}")
    motion = name[len("DeepMimic"):].lower()
    if motion == "multitask":
        from .multitask import MultiTaskEnv
        kwargs.setdefault("task_obs", True)
        return MultiTaskEnv(("walk", "punch", "kick"), **kwargs)
    return DeepMimicEnv(motion=motion, **kwargs)

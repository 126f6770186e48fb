"""Fused substep kernel (ops/substep_lin.py) equivalence tests.

1. The fused per-env reference math must reproduce the unfused engine path
   (spd_accel + contact.solve) trajectory-for-trajectory.
2. The Pallas kernel (interpret mode on CPU) must reproduce the reference
   math bit-for-bit up to fp32 roundoff.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pfpn_tpu.envs.assets import HUMANOID_KD, HUMANOID_KP, humanoid_tree
from pfpn_tpu.sim.engine import Engine, EngineConfig
from pfpn_tpu.sim import contact as contact_mod
from pfpn_tpu.sim.dynamics import crba, fk, pack_velocity, rnea
from pfpn_tpu.control.spd import build_gains, spd_errors


def humanoid_gains(tree):
    return build_gains(tree, HUMANOID_KP, HUMANOID_KD)


def _drop_state(tree, key, height=0.9):
    # lowest candidate contact point is 0.881 below the base at zero pose
    """A falling/contacting state with random joint perturbations."""
    from pfpn_tpu.sim.types import zero_state

    st = zero_state(tree)
    k1, k2, k3 = jax.random.split(key, 3)
    st = st.replace(
        base_pos=jnp.array([0.0, height, 0.0]),
        base_lin=jnp.array([0.1, -0.5, 0.05]),
        base_ang=0.1 * jax.random.normal(k3, (3,)),
        w_sph=0.2 * jax.random.normal(k1, st.w_sph.shape),
        w_rev=0.2 * jax.random.normal(k2, st.w_rev.shape),
    )
    return st


def test_fused_reference_matches_unfused_engine():
    tree = humanoid_tree()
    gains = humanoid_gains(tree)
    eng_old = Engine(tree, EngineConfig(fused=False), gains=gains)
    eng_new = Engine(tree, EngineConfig(fused=True), gains=gains)
    assert eng_new._substep_core is not None

    tgt_sph = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
    tgt_rev = jnp.zeros((tree.n_rev,))

    st_o = st_n = _drop_state(tree, jax.random.PRNGKey(0))
    step_o = jax.jit(lambda s: eng_old.control_step(s, tgt_sph, tgt_rev))
    step_n = jax.jit(lambda s: eng_new.control_step(s, tgt_sph, tgt_rev))
    touched = False
    for i in range(10):  # 200 substeps incl. ground contact
        st_o, lc_o = step_o(st_o)
        st_n, lc_n = step_n(st_n)
        touched = touched or bool(np.asarray(lc_o).any())
        np.testing.assert_array_equal(np.asarray(lc_n), np.asarray(lc_o))
    np.testing.assert_allclose(
        np.asarray(st_n.base_pos), np.asarray(st_o.base_pos), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(st_n.q_rev), np.asarray(st_o.q_rev), atol=2e-3)
    assert touched  # the trajectory actually exercised the contact solver


def test_pallas_kernel_matches_reference_interpret():
    from pfpn_tpu.ops.substep_lin import (
        _substep_core_pallas, _substep_core_reference,
    )

    tree = humanoid_tree()
    gains = humanoid_gains(tree)
    eng = Engine(tree, EngineConfig(fused=True), gains=gains)
    from pfpn_tpu.ops import substep_lin as sl

    cfg = eng.config
    sph_motors, rev_motors = [], []
    from pfpn_tpu.sim.types import REVOLUTE
    for m, b in enumerate(tree.motor_bodies):
        d = int(tree.dof_offset[b])
        lim = float(tree.motor_torque_limit[m])
        (rev_motors if tree.joint_type[b] == REVOLUTE else sph_motors).append(
            (d, lim))
    meta = sl.SubstepMeta(
        ndof=tree.ndof, kd=tuple(float(x) for x in gains.kd), dt=cfg.dt,
        sph_motors=tuple(sph_motors), rev_motors=tuple(rev_motors),
        n_contacts=cfg.contact.max_contacts,
        n_limits=int(eng.contact_set.limit_dof.shape[0]),
        mu=cfg.contact.mu, cfm=cfg.contact.cfm,
        iterations=cfg.contact.iterations,
        relaxation=cfg.contact.relaxation,
    )

    # assemble batched inputs from a few random contacting states
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(42), B)
    states = jax.vmap(lambda k: _drop_state(tree, k, height=0.878))(keys)

    def inputs(st):
        fkr = fk(tree, st)
        h = crba(tree, fkr)
        c = rnea(tree, fkr,
                 gravity=jnp.asarray(cfg.gravity, dtype=jnp.float32))
        v = pack_velocity(tree, st, fkr)
        tgt_sph = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
        tgt_rev = jnp.zeros((tree.n_rev,))
        e_p, e_dp = spd_errors(tree, gains, st, tgt_sph, tgt_rev, cfg.dt)
        kp = jnp.asarray(gains.kp, dtype=jnp.float32)
        kd = jnp.asarray(gains.kd, dtype=jnp.float32)
        kpe = kp * e_p + kd * e_dp
        rs = contact_mod.assemble_rows(
            tree, eng.contact_set, cfg.contact, fkr, st.q_rev, cfg.dt)
        return h, kpe - c, kpe, v, rs.rows, rs.target, rs.act_n, rs.act_l

    args = jax.vmap(inputs)(states)
    want = jax.vmap(lambda *a: _substep_core_reference(meta, *a))(*args)
    got = _substep_core_pallas(meta, *args, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # the state must be non-trivial: some contacts active
    assert float(jnp.sum(args[6])) > 0

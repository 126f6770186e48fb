"""Level-batched dynamics (sim/batched.py) vs the recursion ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from pfpn_tpu.envs.assets import humanoid_tree
from pfpn_tpu.math import quaternion as quat
from pfpn_tpu.sim import zero_state
from pfpn_tpu.sim.batched import build_tables, compute
from pfpn_tpu.sim.dynamics import crba, fk, pack_velocity, rnea


def test_batched_matches_recursion():
    tree = humanoid_tree()
    tb = build_tables(tree)
    k = jax.random.PRNGKey(7)
    ks = jax.random.split(k, 8)
    st = zero_state(tree).replace(
        base_pos=jnp.array([3.0, 1.2, -2.0]),  # away from origin: lever arms
        base_quat=quat.quat_normalize(jax.random.normal(ks[1], (4,))),
        base_lin=jax.random.normal(ks[2], (3,)) * 0.5,
        base_ang=jax.random.normal(ks[3], (3,)) * 0.5,
        q_sph=quat.quat_normalize(jax.random.normal(ks[4], (tree.n_sph, 4))),
        w_sph=jax.random.normal(ks[5], (tree.n_sph, 3)) * 0.5,
        q_rev=jnp.array([-1.0, 0.5, -1.0, 0.5]),
        w_rev=jax.random.normal(ks[7], (tree.n_rev,)) * 0.5,
    )
    g = jnp.array([0.0, -9.8, 0.0])

    fkr = fk(tree, st)
    h_ref = np.asarray(crba(tree, fkr))
    c_ref = np.asarray(rnea(tree, fkr, gravity=g))
    v_ref = np.asarray(pack_velocity(tree, st, fkr))

    bd = compute(tree, tb, st, g)
    np.testing.assert_allclose(np.asarray(bd.fkr.body_pos),
                               np.asarray(fkr.body_pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(bd.v), v_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(bd.fkr.v), np.asarray(fkr.v),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(bd.h), h_ref, atol=2e-3)
    np.testing.assert_allclose(np.asarray(bd.c), c_ref,
                               atol=2e-3 * max(1.0, np.abs(c_ref).max()))


def test_engine_fast_dynamics_equivalent():
    """Engine trajectories with fast_dynamics on/off agree closely."""
    from pfpn_tpu.envs.deepmimic import make
    from pfpn_tpu.sim.engine import EngineConfig
    import dataclasses

    def run(fast):
        env = make("DeepMimicWalk-v0")
        env.engine.config = dataclasses.replace(env.engine.config,
                                                fast_dynamics=fast)
        if fast:
            from pfpn_tpu.sim.batched import build_tables
            env.engine.batched_tables = build_tables(env.tree)
        state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        res = step(state, jnp.zeros(env.action_size))
        for _ in range(4):
            res = step(res.state, jnp.zeros(env.action_size))
        return float(res.reward), np.asarray(res.state.sim.base_pos)

    r0, p0 = run(False)
    r1, p1 = run(True)
    assert abs(r0 - r1) < 5e-3
    np.testing.assert_allclose(p0, p1, atol=5e-3)

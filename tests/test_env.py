"""DeepMimic env parity checks: mocap, observation, reward, termination."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfpn_tpu.envs.assets import humanoid_tree
from pfpn_tpu.envs.deepmimic import make
from pfpn_tpu.mocap import load_motion, sample_pose


@pytest.fixture(scope="module")
def env():
    return make("DeepMimicWalk-v0")


@pytest.fixture(scope="module")
def motion():
    return load_motion(humanoid_tree(), "walk")


def test_motion_tables(motion):
    assert motion.duration > 1.0
    assert motion.q_sph.shape[1] == 8
    assert motion.q_rev.shape[1] == 4
    assert motion.contactable_links == ("left_foot", "right_foot")
    # quaternions normalized after reorder
    n = np.linalg.norm(motion.q_sph, axis=-1)
    np.testing.assert_allclose(n, 1.0, atol=1e-3)
    # knee angles (rev indices 0, 2) are non-positive (limit [-3.14, 0]);
    # elbows (1, 3) are non-negative (limit [0, 3.14])
    assert motion.q_rev[:, [0, 2]].max() < 0.05
    assert motion.q_rev[:, [1, 3]].min() > -0.05


def test_sample_pose_interpolates(motion):
    t0 = float(motion.times[3])
    t1 = float(motion.times[4])
    p0 = sample_pose(motion, jnp.asarray(t0))
    pm = sample_pose(motion, jnp.asarray(0.5 * (t0 + t1)))
    np.testing.assert_allclose(
        np.asarray(p0.base_pos), motion.base_pos[3], atol=1e-5
    )
    # midpoint between frames
    np.testing.assert_allclose(
        np.asarray(pm.base_pos), 0.5 * (motion.base_pos[3] + motion.base_pos[4]),
        atol=1e-5,
    )


def test_sample_pose_wraps(motion):
    p = sample_pose(motion, jnp.asarray(motion.duration + 0.01))
    p2 = sample_pose(motion, jnp.asarray(0.01))
    np.testing.assert_allclose(np.asarray(p.q_rev), np.asarray(p2.q_rev), atol=1e-5)


def test_env_spaces(env):
    assert env.observation_size == 197
    assert env.action_size == 36
    # spherical z-offset quirk (deepmimic.py:434-441)
    np.testing.assert_allclose(env.action_mean[:4], [0, 0, 0.2, 0], atol=1e-6)
    np.testing.assert_allclose(env.action_low[:4], [-1, -1, -1.2, -1], atol=1e-6)
    np.testing.assert_allclose(env.action_high[:4], [1, 1, 0.8, 1], atol=1e-6)
    # abdomen angle std = (1.2 - (-1.2)) * 0.5 * 4
    np.testing.assert_allclose(env.action_std[3], 4.8, atol=1e-5)


def test_reset_matches_reference_pose(env):
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(3))
    assert obs.shape == (197,)
    assert bool(jnp.all(jnp.isfinite(obs)))
    # phase in [0, 1)
    assert 0.0 <= float(obs[0]) < 1.0
    # reward at the reset state (before any dynamics) should be ~1:
    # the sim state equals the reference pose exactly
    r = env.reward(state, jnp.zeros((), bool))
    assert float(r) > 0.95


def test_reward_decreases_with_perturbation(env):
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
    r0 = float(env.reward(state, jnp.zeros((), bool)))
    sim = state.sim.replace(
        base_pos=state.sim.base_pos + jnp.array([0.3, 0.0, 0.0]),
        base_lin=state.sim.base_lin + 1.0,
    )
    r1 = float(env.reward(state.replace(sim=sim), jnp.zeros((), bool)))
    assert r1 < r0
    r_term = float(env.reward(state, jnp.ones((), bool)))
    assert r_term == 0.0


def test_step_zero_action_stable(env):
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    res = step(state, jnp.zeros(env.action_size))
    assert 0.0 <= float(res.reward) <= 1.0
    assert bool(jnp.all(jnp.isfinite(res.obs)))


def test_truncation_at_time_limit():
    env = make("DeepMimicWalk-v0", overtime=0.05)  # truncate after 2 steps
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    res = step(state, jnp.zeros(env.action_size))
    res = step(res.state, jnp.zeros(env.action_size))
    assert bool(res.truncated)
    assert bool(res.done)
    assert not bool(res.terminated)
    # truncation does not zero the reward (deepmimic.py:548-550)
    assert float(res.reward) > 0.0


def test_autoreset(env):
    n = 4
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    states, obs = jax.jit(env.reset_batch)(keys)
    step = jax.jit(env.step_autoreset)
    # drive hard random actions until some env falls
    k = jax.random.PRNGKey(7)
    fell = False
    for i in range(20):
        k, ka, kr = jax.random.split(k, 3)
        a = jax.random.uniform(ka, (n, env.action_size), minval=-1, maxval=1)
        states, obs, res = step(states, a, jax.random.split(kr, n))
        if bool(jnp.any(res.done)):
            fell = True
            break
    assert fell
    # post-reset elapsed_time was re-randomized for done envs
    assert bool(jnp.all(jnp.isfinite(obs)))


def test_all_motions_load():
    for m in ("walk", "punch", "kick"):
        env = make(f"DeepMimic{m.capitalize()}-v0")
        assert env.motion.duration > 0.5


def test_discrete_wrapper():
    from pfpn_tpu.envs.wrappers import DiscreteActionWrapper

    env = make("DeepMimicWalk-v0")
    w = DiscreteActionWrapper(env, 5)
    assert w.action_low is None
    state, obs = jax.jit(w.reset)(jax.random.PRNGKey(0))
    a = jnp.full((env.action_size,), 2, dtype=jnp.int32)  # mid bin
    res = jax.jit(w.step)(state, a)
    assert bool(jnp.all(jnp.isfinite(res.obs)))
    # bin 0 maps to low, bin n-1 to high
    np.testing.assert_allclose(
        np.asarray(w._continuous(jnp.zeros(36, jnp.int32))), env.action_low,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(w._continuous(jnp.full(36, 4, jnp.int32))), env.action_high,
        atol=1e-6,
    )


def test_torque_log_channel(env):
    """step_log returns the applied per-dof torque history with the
    reference's named channels (deepmimic.py:401-414, 772-798) and the same
    env transition as step()."""
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(3))
    a = jnp.zeros(env.action_size)
    res_plain = jax.jit(env.step)(state, a)
    res, tau_hist = jax.jit(env.step_log)(state, a)
    assert tau_hist.shape == (env.frame_skip, env.tree.ndof)
    # same transition as the plain step (fused/unfused cross-validated)
    np.testing.assert_allclose(np.asarray(res.obs), np.asarray(res_plain.obs),
                               rtol=2e-3, atol=2e-3)
    # floating-base dofs carry no actuation
    np.testing.assert_allclose(np.asarray(tau_hist[:, :6]), 0.0, atol=1e-6)
    # actuated joints produce nonzero SPD torques for a non-reference pose
    assert float(jnp.max(jnp.abs(tau_hist))) > 1.0
    log = env.torque_log(tau_hist)
    # 8 spherical x 3 + 4 revolute = 28 named channels
    assert len(log) == 28
    assert {"right_knee", "left_knee", "right_elbow", "left_elbow"} <= set(log)
    assert any(k.endswith("_x") for k in log)
    for v in log.values():
        assert v.shape == (env.frame_skip,)


def test_gym_adapter_stateful_surface():
    """Stateful gym-API adapter (reference envs/gym_api/env.py:1-29,
    spaces.py:51-65): reset()->obs, step->(obs, r, done, info) with the
    TimeLimit.truncated info key, mutable Box spaces."""
    import numpy as np

    from pfpn_tpu.envs.gym_adapter import Box, GymEnv

    genv = GymEnv(make("DeepMimicWalk-v0", overtime=0.05,
                       random_init_pose=False), seed=3)
    assert isinstance(genv.action_space, Box)
    assert isinstance(genv.observation_space, Box)
    assert genv.action_space.shape == (genv.action_size,)
    assert genv.observation_space.shape == (genv.observation_size,)
    # Box attributes are plain mutable fields (settings/wrappers.py:7-12)
    genv.action_space.shape = [7] * genv.action_size
    del genv.action_space.low, genv.action_space.high

    obs = genv.reset()
    assert obs.shape == (genv.observation_size,)
    a = np.zeros(genv.action_size, dtype=np.float32)
    done, info = False, {}
    for _ in range(3):
        obs, r, done, info = genv.step(a)
        assert obs.shape == (genv.observation_size,)
        assert 0.0 <= r <= 1.0
        if done:
            break
    assert done and info["TimeLimit.truncated"] is True  # overtime=0.05

    # seed() controls the reset RNG stream deterministically
    genv2 = GymEnv(make("DeepMimicWalk-v0"), seed=5)
    o1 = genv2.reset()
    genv2.seed(5)
    o2 = genv2.reset()
    np.testing.assert_allclose(o1, o2)


def test_gym_adapter_space_sample_and_getattr_guard():
    """Box.sample() must handle unbounded dims (the adapter's
    observation_space is +-inf) and __getattr__ must not recurse when
    'env' is absent (copy/pickle create instances without __init__)."""
    import numpy as np

    from pfpn_tpu.envs.gym_adapter import Box, GymEnv

    finite = Box(low=np.zeros(3), high=np.ones(3))
    s = finite.sample()
    assert s.shape == (3,) and np.all(s >= 0) and np.all(s <= 1)

    unbounded = Box(low=np.full(4, -np.inf), high=np.full(4, np.inf),
                    shape=(4,))
    s = unbounded.sample()  # must not raise OverflowError
    assert s.shape == (4,) and np.all(np.isfinite(s))

    shell = object.__new__(GymEnv)  # no __init__, no .env attribute
    with pytest.raises(AttributeError):
        shell.anything  # noqa: B018 — must raise, not recurse


def test_make_multitask_task_obs_kwarg():
    """make() must accept an explicit task_obs override (it defaults the
    kwarg instead of hardcoding it)."""
    mt = make("DeepMimicMultiTask-v0", task_obs=False)
    assert mt.observation_size == mt.base_observation_size


def test_ref_table_reward_matches_exact_fk():
    """The dense phase-table reference FK (600 Hz lerp) must reproduce the
    exact per-step reference FK reward (deepmimic.py:594-753) to
    interpolation tolerance, including with a nonzero cycle-wrap offset."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    env_tbl = make("DeepMimicWalk-v0")
    env_exact = make("DeepMimicWalk-v0", exact_ref_reward=True)

    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    states, _ = env_tbl.reset_batch(keys)
    # random actions + a few steps to decorrelate sim from the reference
    a = jax.random.uniform(
        jax.random.PRNGKey(1), (8, env_tbl.action_size), minval=-0.3, maxval=0.3)
    for _ in range(3):
        res = env_tbl.step_batch(states, a)
        states = res.state
    # inject a horizontal offset like a cycle wrap would
    states = states.replace(
        ref_pos_offset=jnp.tile(jnp.array([0.7, 0.0, -0.3]), (8, 1)))

    term = jnp.zeros(8, dtype=bool)
    r_tbl = jax.vmap(env_tbl.reward)(states, term)
    r_exact = jax.vmap(env_exact.reward)(states, term)
    np.testing.assert_allclose(
        np.asarray(r_tbl), np.asarray(r_exact), atol=2e-4)


def test_multitask_env_matches_per_task_envs():
    """DeepMimicMultiTask-v0: contiguous slices of the batch run different
    motions inside one jitted program (BASELINE.md multi-task target; no
    reference counterpart — main.py trains one motion per process). Slice k
    must behave exactly like the single-task env for motion k, with a task
    one-hot appended to the observation."""
    from pfpn_tpu.envs.multitask import MultiTaskEnv

    mt = make("DeepMimicMultiTask-v0")
    assert isinstance(mt, MultiTaskEnv)
    assert mt.num_tasks == 3
    assert mt.observation_size == mt.base_observation_size + 3

    keys = jax.random.split(jax.random.PRNGKey(3), 6)
    states, obs = jax.jit(mt.reset_batch)(keys)
    assert obs.shape == (6, mt.observation_size)
    # one-hot block: slots 0-1 walk, 2-3 punch, 4-5 kick
    onehot = np.asarray(obs[:, -3:])
    np.testing.assert_array_equal(
        onehot, np.repeat(np.eye(3), 2, axis=0))

    # slice equivalence: per-task env with the same keys reproduces the
    # multi-task slice exactly (reset and one autoreset step)
    a = jax.random.uniform(jax.random.PRNGKey(5), (6, mt.action_size),
                           minval=-0.2, maxval=0.2)
    rkeys = jax.random.split(jax.random.PRNGKey(9), 6)
    n_states, n_obs, res = jax.jit(mt.step_autoreset)(states, a, rkeys)
    assert n_obs.shape == (6, mt.observation_size)
    assert bool(np.all(np.isfinite(np.asarray(res.reward))))
    for k, motion_name in enumerate(mt.motions):
        sub = make(f"DeepMimic{motion_name.capitalize()}-v0")
        s_k, o_k = sub.reset_batch(keys[2 * k:2 * k + 2])
        np.testing.assert_allclose(
            np.asarray(obs[2 * k:2 * k + 2, :-3]), np.asarray(o_k),
            rtol=1e-5, atol=2e-5)
        r_k = sub.step_batch(s_k, a[2 * k:2 * k + 2])
        np.testing.assert_allclose(
            np.asarray(res.reward[2 * k:2 * k + 2]), np.asarray(r_k.reward),
            rtol=1e-4, atol=1e-4)


def test_reward_terms_sum_to_reward(env):
    """reward_terms() is an exact decomposition: the five weighted terms
    sum to reward() (diagnostic path for tools/reward_term_replay.py)."""
    state, _ = jax.jit(env.reset)(jax.random.PRNGKey(3))
    sim = state.sim.replace(
        base_pos=state.sim.base_pos + jnp.array([0.1, 0.0, 0.0]))
    st = state.replace(sim=sim)
    for flag in (False, True):
        t = jnp.asarray(flag)
        terms = env.reward_terms(st, t)
        assert set(terms) == {"pose", "vel", "end_eff", "root", "com"}
        total = sum(terms.values())
        r = env.reward(st, t)
        np.testing.assert_allclose(np.asarray(total), np.asarray(r),
                                   rtol=1e-6, atol=1e-7)
    assert float(sum(env.reward_terms(st, jnp.asarray(True)).values())) == 0.0

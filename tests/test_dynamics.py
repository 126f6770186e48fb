"""Physics-core validation: FK / CRBA / RNEA consistency, conservation laws.

The reference has no tests (SURVEY.md §4); these implement the physics test
pyramid it implies: closed-form checks plus internal cross-validation between
independent algorithms (CRBA vs RNEA), energy/momentum conservation, and
analytic pendulum behaviour.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfpn_tpu.envs.assets import humanoid_tree, HUMANOID_KP, HUMANOID_KD
from pfpn_tpu.control.spd import build_gains
from pfpn_tpu.math import quaternion as quat
from pfpn_tpu.sim import Engine, EngineConfig, load_urdf, zero_state
from pfpn_tpu.sim.dynamics import crba, fk, link_states, pack_velocity, rnea


PENDULUM_URDF = """
<robot name="pendulum">
  <link name="base">
    <inertial><mass value="0.001"/>
      <inertia ixx="1e-6" ixy="0" ixz="0" iyy="1e-6" iyz="0" izz="1e-6"/>
    </inertial>
  </link>
  <link name="bob">
    <inertial><origin xyz="0 -1 0"/><mass value="2.0"/></inertial>
    <collision><origin xyz="0 -1 0"/>
      <geometry><sphere radius="0.05"/></geometry>
    </collision>
  </link>
  <joint name="hinge" type="revolute">
    <parent link="base"/><child link="bob"/>
    <origin xyz="0 0 0"/><axis xyz="0 0 1"/>
    <limit effort="100" lower="-10" upper="10"/>
  </joint>
</robot>
"""


@pytest.fixture(scope="module")
def tree():
    return humanoid_tree()


@pytest.fixture(scope="module")
def rand_state(tree):
    k = jax.random.PRNGKey(42)
    ks = jax.random.split(k, 8)
    st = zero_state(tree)
    return st.replace(
        base_pos=jax.random.normal(ks[0], (3,)),
        base_quat=quat.quat_normalize(jax.random.normal(ks[1], (4,))),
        base_lin=jax.random.normal(ks[2], (3,)) * 0.5,
        base_ang=jax.random.normal(ks[3], (3,)) * 0.5,
        q_sph=quat.quat_normalize(jax.random.normal(ks[4], (tree.n_sph, 4))),
        w_sph=jax.random.normal(ks[5], (tree.n_sph, 3)) * 0.5,
        # sample revolute angles strictly inside their joint limits (knees
        # [-3.14, 0], elbows [0, 3.14]) so joint-limit impulses stay inactive
        q_rev=jnp.array([
            float(np.random.RandomState(i).uniform(lo + 0.3, hi - 0.3))
            for i, (lo, hi) in enumerate(
                tree.motor_movement_limit[
                    [m for m, b in enumerate(tree.motor_bodies)
                     if tree.joint_type[b] == 2]
                ]
            )
        ]),
        w_rev=jax.random.normal(ks[7], (tree.n_rev,)) * 0.5,
    )


def test_humanoid_tree_structure(tree):
    assert tree.nb == 13
    assert tree.ndof == 34
    assert tree.n_sph == 8
    assert tree.n_rev == 4
    assert len(tree.link_names) == 15
    assert tree.link_names[0] == "pelvis"
    assert tree.link_names[2] == "head"
    assert len(tree.motor_names) == 12
    assert tree.motor_names[0] == "abdomen"
    assert tree.motor_names[3] == "right_knee"
    np.testing.assert_allclose(tree.mass.sum(), 45.001, atol=1e-6)
    # scaled joint offset: abdomen at 0.944604 * 0.25
    np.testing.assert_allclose(tree.joint_pos[1][1], 0.944604 * 0.25, atol=1e-6)


def test_mass_matrix_symmetric_pd(tree, rand_state):
    fkr = fk(tree, rand_state)
    h = np.asarray(crba(tree, fkr))
    np.testing.assert_allclose(h, h.T, atol=1e-4)
    eig = np.linalg.eigvalsh(h)
    assert eig.min() > 0


def test_crba_rnea_consistency(tree, rand_state):
    """tau(qdd) - tau(0) == H @ qdd — cross-validates CRBA against RNEA."""
    fkr = fk(tree, rand_state)
    h = crba(tree, fkr)
    qdd = jax.random.normal(jax.random.PRNGKey(1), (tree.ndof,))
    tau_full = rnea(tree, fkr, qdd=qdd)
    tau_bias = rnea(tree, fkr)
    np.testing.assert_allclose(
        np.asarray(tau_full - tau_bias), np.asarray(h @ qdd), rtol=2e-3, atol=1e-3
    )


def test_rnea_static_gravity_torque(tree):
    """At rest, bias force equals pure gravity load; base force = total weight."""
    st = zero_state(tree).replace(base_pos=jnp.array([0.0, 5.0, 0.0]))
    fkr = fk(tree, st)
    c = np.asarray(rnea(tree, fkr))
    # base linear part (dofs 3:6, body frame == world at identity quat)
    np.testing.assert_allclose(c[3:6], [0.0, 9.8 * tree.mass.sum(), 0.0], atol=1e-3)


def test_free_fall(tree):
    cfg = EngineConfig(control_mode="torque")
    eng = Engine(humanoid_tree(), cfg)
    st = zero_state(tree).replace(base_pos=jnp.array([0.0, 10.0, 0.0]))
    zero_t = [jnp.zeros(int(tree.dof_count[b])) for b in tree.motor_bodies]
    tq = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
    tr = jnp.zeros(tree.n_rev)

    n = 60
    st = jax.jit(lambda s: jax.lax.fori_loop(
        0, n, lambda _, x: eng.substep(x, tq, tr, zero_t)[0], s))(st)
    t = n * cfg.dt
    # uniform gravity: CoM falls by g t^2 / 2 regardless of articulation
    expect_v = -9.8 * t
    np.testing.assert_allclose(float(st.base_lin[1]), expect_v, rtol=1e-3)


def test_energy_conservation_no_gravity(tree, rand_state):
    cfg = EngineConfig(gravity=(0.0, 0.0, 0.0), control_mode="torque")
    eng = Engine(tree, cfg)
    st = rand_state.replace(base_pos=jnp.array([0.0, 50.0, 0.0]))
    zero_t = [jnp.zeros(int(tree.dof_count[b])) for b in tree.motor_bodies]
    tq = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
    tr = jnp.zeros(tree.n_rev)

    def ke(s):
        fkr = fk(tree, s)
        h = crba(tree, fkr)
        v = pack_velocity(tree, s, fkr)
        return 0.5 * float(v @ h @ v)

    e0 = ke(st)
    st = jax.jit(lambda s: jax.lax.fori_loop(
        0, 120, lambda _, x: eng.substep(x, tq, tr, zero_t)[0], s))(st)
    e1 = ke(st)
    assert abs(e1 - e0) / max(e0, 1e-6) < 0.05


def test_momentum_conservation_no_gravity(tree, rand_state):
    cfg = EngineConfig(gravity=(0.0, 0.0, 0.0), control_mode="torque")
    eng = Engine(tree, cfg)
    st = rand_state.replace(base_pos=jnp.array([0.0, 50.0, 0.0]))
    zero_t = [jnp.zeros(int(tree.dof_count[b])) for b in tree.motor_bodies]
    tq = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
    tr = jnp.zeros(tree.n_rev)

    def momentum(s):
        ls = link_states(tree, fk(tree, s))
        m = jnp.asarray(tree.link_mass, dtype=jnp.float32)[:, None]
        return np.asarray(jnp.sum(m * ls.lin_vel, axis=0))

    p0 = momentum(st)
    st = jax.jit(lambda s: jax.lax.fori_loop(
        0, 120, lambda _, x: eng.substep(x, tq, tr, zero_t)[0], s))(st)
    p1 = momentum(st)
    # fp32 accumulation over 120 substeps; f64 drift is ~1e-9 (verified during
    # development via jax_enable_x64)
    np.testing.assert_allclose(p1, p0, atol=0.05)


def test_pendulum_period(tmp_path):
    """Small-angle period of a point-mass pendulum: T = 2 pi sqrt(l/g)."""
    path = tmp_path / "pend.urdf"
    path.write_text(PENDULUM_URDF)
    tree = load_urdf(str(path), use_fixed_base=True)
    cfg = EngineConfig(control_mode="torque", dt=1.0 / 600.0)
    eng = Engine(tree, cfg)
    st = zero_state(tree).replace(
        base_pos=jnp.array([0.0, 10.0, 0.0]),
        q_rev=jnp.array([0.1]),
    )
    zero_t = [jnp.zeros(1)]
    tq = jnp.zeros((0, 4))
    tr = jnp.zeros(1)

    def step(s):
        return eng.substep(s, tq, tr, zero_t)[0]

    @jax.jit
    def rollout(s):
        def body(s, _):
            s = step(s)
            return s, s.q_rev[0]
        return jax.lax.scan(body, s, None, length=1900)
    st, angles = rollout(st)  # > 1.5 periods: two downward crossings inside
    angles = np.asarray(angles)
    # find first two downward zero crossings -> period
    sign = np.sign(angles)
    crossings = np.where((sign[:-1] > 0) & (sign[1:] <= 0))[0]
    assert len(crossings) >= 2
    period = (crossings[1] - crossings[0]) * cfg.dt
    # sphere bob radius adds negligible inertia: l = 1, g = 9.8
    expect = 2 * np.pi * np.sqrt(1.0 / 9.8) * (1 + 0.1**2 / 16)
    np.testing.assert_allclose(period, expect, rtol=0.02)


def test_spd_tracks_target(tmp_path):
    path = tmp_path / "pend.urdf"
    path.write_text(PENDULUM_URDF)
    tree = load_urdf(str(path), use_fixed_base=True)
    gains = build_gains(tree, {"hinge": 500.0}, {"hinge": 50.0})
    cfg = EngineConfig(control_mode="spd")
    eng = Engine(tree, cfg, gains=gains)
    st = zero_state(tree).replace(base_pos=jnp.array([0.0, 10.0, 0.0]))
    tq = jnp.zeros((0, 4))
    target = jnp.array([0.7])

    def step(s):
        return eng.substep(s, tq, target)[0]

    st = jax.jit(lambda s: jax.lax.fori_loop(0, 900, lambda _, x: step(x), s))(st)
    # steady-state error from gravity torque: kp * e = m g l sin(theta)
    theta = float(st.q_rev[0])
    resid = 500.0 * (0.7 - theta) - 2.0 * 9.8 * 1.0 * np.sin(theta)
    assert abs(theta - 0.7) < 0.1
    assert abs(resid) < 1.0


def test_ground_contact_sphere_rests(tmp_path):
    """A ball dropped on the plane settles at penetration ~0 without bouncing."""
    path = tmp_path / "ball.urdf"
    path.write_text("""
<robot name="ball">
  <link name="base">
    <inertial><mass value="1.0"/></inertial>
    <collision><geometry><sphere radius="0.1"/></geometry></collision>
  </link>
</robot>
""")
    tree = load_urdf(str(path))
    eng = Engine(tree, EngineConfig(control_mode="torque"))
    st = zero_state(tree).replace(base_pos=jnp.array([0.0, 0.3, 0.0]))
    tq = jnp.zeros((0, 4))
    tr = jnp.zeros(0)
    @jax.jit
    def rollout(s):
        def body(s, _):
            s = eng.substep(s, tq, tr, [])[0]
            return s, s.base_pos[1]
        return jax.lax.scan(body, s, None, length=900)
    st, heights = rollout(st)
    heights = np.asarray(heights)
    # settled on the surface, not sunk, not exploded
    assert abs(heights[-1] - 0.1) < 0.01
    assert abs(float(st.base_lin[1])) < 0.05
    # no energetic bounce after settling
    assert max(heights[600:]) - min(heights[600:]) < 0.005


def test_humanoid_standing_on_ground_stable(tree):
    """Humanoid dropped just above the ground with SPD holding zero pose
    does not explode within half a second of sim time."""
    gains = build_gains(tree, HUMANOID_KP, HUMANOID_KD)
    eng = Engine(tree, EngineConfig(), gains=gains)
    st = zero_state(tree).replace(base_pos=jnp.array([0.0, 0.85, 0.0]))
    tq = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
    tr = jnp.zeros(tree.n_rev)
    st = jax.jit(lambda s: jax.lax.fori_loop(
        0, 15, lambda _, x: eng.control_step(x, tq, tr)[0], s))(st)  # 0.5 s
    assert np.all(np.isfinite(np.asarray(st.base_pos)))
    assert float(jnp.linalg.norm(st.base_lin)) < 10.0
    # still roughly upright (started standing; may wobble but not collapse through floor)
    assert 0.2 < float(st.base_pos[1]) < 2.0


def test_sliding_ball_transitions_to_rolling(tmp_path):
    """Friction-cone analytic check for the sequential-impulse solver: a
    solid sphere sliding at v0 on the plane (mu large enough to grip) must
    end up ROLLING at 5/7 v0 — kinetic friction decelerates the center and
    spins the ball until the contact point velocity vanishes, then friction
    stops acting. Validates the tangential projection + normal coupling."""
    path = tmp_path / "ball.urdf"
    path.write_text("""
<robot name="ball">
  <link name="base">
    <inertial><mass value="1.0"/></inertial>
    <collision><geometry><sphere radius="0.1"/></geometry></collision>
  </link>
</robot>
""")
    tree = load_urdf(str(path))
    eng = Engine(tree, EngineConfig(control_mode="torque"))
    v0 = 0.5
    st = zero_state(tree).replace(
        base_pos=jnp.array([0.0, 0.1, 0.0]),   # resting on the surface
        base_lin=jnp.array([v0, 0.0, 0.0]),
    )
    tq = jnp.zeros((0, 4))
    tr = jnp.zeros(0)

    @jax.jit
    def rollout(s):
        def body(s, _):
            s = eng.substep(s, tq, tr, [])[0]
            return s, s.base_pos[0]
        return jax.lax.scan(body, s, None, length=900)

    st, xs = rollout(st)  # 1.5 s at 600 Hz
    xs = np.asarray(xs)
    # steady speed over the last 0.5 s (rolling, no friction losses)
    speed = (xs[-1] - xs[-300]) / (300 / 600.0)
    np.testing.assert_allclose(speed, 5.0 / 7.0 * v0, rtol=0.03)
    # and the slide phase dissipated exactly the slip: distance traveled is
    # bounded between pure-rolling-from-start and frictionless
    assert xs[-1] < v0 * 1.5
    assert xs[-1] > 5.0 / 7.0 * v0 * 1.5 * 0.9


# -- Bullet POSITION_CONTROL servo (implicit motor constraint) ------------

def test_position_control_tracks_target(tmp_path):
    """Bullet POSITION_CONTROL parity (reference agent.py:290-315, rebuilt
    as an implicit velocity-level motor constraint in control/spd.py): in
    the unsaturated regime the servo's defining property holds — post-
    substep velocity = kp*e/dt, so the error contracts geometrically
    (e' = (1-kp)e) and the pendulum settles on the target against gravity
    with near-zero residual velocity. The pendulum is light (I=0.018) with
    effort 2000 so kp*e/dt stays reachable within one substep's impulse
    cap for the whole trajectory; a *saturated* servo (cap ≪ the braking
    impulse the kp*e/dt approach speed requires) limit-cycles around the
    target in Bullet and here alike — that regime's cap semantics are
    covered by test_implicit_motor_impulse_caps."""
    path = tmp_path / "pend.urdf"
    path.write_text(PENDULUM_URDF
                    .replace('xyz="0 -1 0"', 'xyz="0 -0.3 0"')
                    .replace('value="2.0"', 'value="0.2"')
                    .replace('effort="100"', 'effort="2000"'))
    tree = load_urdf(str(path), use_fixed_base=True)
    eng = Engine(tree, EngineConfig(control_mode="position"))
    st = zero_state(tree).replace(base_pos=jnp.array([0.0, 10.0, 0.0]))
    tq = jnp.zeros((0, 4))
    target = jnp.array([0.7])
    st = jax.jit(lambda s: jax.lax.fori_loop(
        0, 1200, lambda _, x: eng.substep(x, tq, target)[0], s))(st)  # 2 s
    assert abs(float(st.q_rev[0]) - 0.7) < 0.01
    assert abs(float(st.w_rev[0])) < 0.1


def test_implicit_motor_velocity_constraint(tmp_path):
    """Unclamped converged solve satisfies Bullet's motor rhs exactly: the
    post-impulse motor velocity equals kp*e/dt + (1-kd)*v_pred (with the
    default velocityGain kd=1, exactly kp*e/dt)."""
    from pfpn_tpu.control.spd import implicit_motor_impulses

    path = tmp_path / "pend.urdf"
    # high effort so the impulse cap never binds
    path.write_text(PENDULUM_URDF.replace('effort="100"', 'effort="1e7"'))
    tree = load_urdf(str(path), use_fixed_base=True)
    st = zero_state(tree).replace(q_rev=jnp.array([0.5]),
                                  w_rev=jnp.array([-2.0]))
    fkr = fk(tree, st)
    h = crba(tree, fkr)
    h_inv = jnp.linalg.inv(h + 1e-8 * jnp.eye(tree.ndof))
    v_pred = pack_velocity(tree, st, fkr)
    dt = 1.0 / 600.0
    target = jnp.array([0.7])
    p = implicit_motor_impulses(
        tree, st, h_inv, v_pred, jnp.zeros((0, 4)), target, dt,
        iterations=200)
    v_after = np.asarray(v_pred + h_inv @ p)
    expect = 0.3 * (0.7 - 0.5) / dt   # kp * e / dt, kd=1 cancels v_pred
    np.testing.assert_allclose(v_after[-1], expect, rtol=1e-4)


def test_implicit_motor_impulse_caps(tree, rand_state):
    """Impulse clamping matches agent.py:317-339 semantics at the impulse
    level: |p| <= effort*dt per revolute row, per-joint L2 norm <=
    effort*dt for spherical; unactuated (base) rows carry zero."""
    from pfpn_tpu.control.spd import (
        _motor_dof_tables, _motor_limits, implicit_motor_impulses)

    fkr = fk(tree, rand_state)
    h = crba(tree, fkr)
    h_inv = jnp.linalg.inv(h + 1e-8 * jnp.eye(tree.ndof))
    v_star = pack_velocity(tree, rand_state, fkr)
    dt = 1.0 / 600.0
    # identity-quaternion targets vs the random pose: huge errors, so the
    # caps are active on every joint
    tq = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
    tr = jnp.zeros(tree.n_rev)
    p = np.asarray(implicit_motor_impulses(
        tree, rand_state, h_inv, v_star, tq, tr, dt))

    sph_dofs, rev_dofs = _motor_dof_tables(tree)
    sph_lim, rev_lim = _motor_limits(tree)
    p3 = p[sph_dofs].reshape(tree.n_sph, 3)
    assert (np.linalg.norm(p3, axis=-1) <= sph_lim * dt * (1 + 1e-5)).all()
    assert (np.abs(p[rev_dofs]) <= rev_lim * dt * (1 + 1e-5)).all()
    rest = np.setdiff1d(np.arange(tree.ndof),
                        np.concatenate([sph_dofs, rev_dofs]))
    assert np.allclose(p[rest], 0.0)
    # and at least one cap actually binds in this configuration
    assert (np.linalg.norm(p3, axis=-1) > 0.9 * sph_lim * dt).any()

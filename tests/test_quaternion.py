import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfpn_tpu.math import quaternion as q


def rand_quat(key, shape=()):
    v = jax.random.normal(key, shape + (4,))
    return q.quat_normalize(v)


def test_multiply_identity():
    k = jax.random.PRNGKey(0)
    qq = rand_quat(k, (7,))
    ident = q.quat_identity((7,))
    np.testing.assert_allclose(q.quat_multiply(qq, ident), qq, atol=1e-6)
    np.testing.assert_allclose(q.quat_multiply(ident, qq), qq, atol=1e-6)


def test_multiply_conjugate_is_identity():
    k = jax.random.PRNGKey(1)
    qq = rand_quat(k, (5,))
    prod = q.quat_multiply(qq, q.quat_conjugate(qq))
    np.testing.assert_allclose(prod, q.quat_identity((5,)), atol=1e-6)


def test_rotate_matches_matrix():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    qq = rand_quat(k1, (6,))
    v = jax.random.normal(k2, (6, 3))
    r1 = q.quat_rotate(qq, v)
    r2 = jnp.einsum("bij,bj->bi", q.quat_to_matrix(qq), v)
    np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_rotate_inv():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    qq = rand_quat(k1, (6,))
    v = jax.random.normal(k2, (6, 3))
    np.testing.assert_allclose(q.quat_rotate_inv(qq, q.quat_rotate(qq, v)), v, atol=1e-5)


def test_matrix_roundtrip():
    k = jax.random.PRNGKey(4)
    qq = rand_quat(k, (16,))
    m = q.quat_to_matrix(qq)
    q2 = q.matrix_to_quat(m)
    # same rotation up to sign
    dot = jnp.abs(jnp.sum(qq * q2, axis=-1))
    np.testing.assert_allclose(dot, jnp.ones(16), atol=1e-5)


def test_axis_angle_roundtrip():
    axis = jnp.array([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0], [0.6, 0.0, 0.8]])
    angle = jnp.array([0.3, 1.5, 2.9])
    qq = q.quat_from_axis_angle(axis, angle)
    a2, ang2 = q.quat_to_axis_angle(qq)
    np.testing.assert_allclose(ang2, angle, atol=1e-5)
    np.testing.assert_allclose(a2, axis, atol=1e-5)


def test_axis_angle_identity_safe():
    a, ang = q.quat_to_axis_angle(q.quat_identity())
    assert float(ang) == pytest.approx(0.0, abs=1e-6)
    assert np.all(np.isfinite(np.asarray(a)))


def test_exp_log_roundtrip():
    k = jax.random.PRNGKey(5)
    v = jax.random.normal(k, (8, 3)) * 0.8
    np.testing.assert_allclose(q.quat_log(q.quat_exp(v)), v, atol=1e-5)


def test_slerp_endpoints_and_midpoint():
    q0 = q.quat_identity()
    q1 = q.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(1.0))
    np.testing.assert_allclose(q.quat_slerp(q0, q1, 0.0), q0, atol=1e-6)
    np.testing.assert_allclose(q.quat_slerp(q0, q1, 1.0), q1, atol=1e-6)
    mid = q.quat_slerp(q0, q1, 0.5)
    expect = q.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(0.5))
    np.testing.assert_allclose(mid, expect, atol=1e-5)


def test_slerp_shortest_path():
    q0 = rand_quat(jax.random.PRNGKey(6))
    mid = q.quat_slerp(q0, -q0, 0.5)  # same rotation, opposite sign
    dot = jnp.abs(jnp.sum(mid * q0))
    assert float(dot) == pytest.approx(1.0, abs=1e-5)


def test_euler_zyx_roundtrip():
    roll, pitch, yaw = 0.3, -0.7, 1.9
    qq = q.euler_zyx_to_quat(roll, pitch, yaw)
    r, p, y = q.quat_to_euler_zyx(qq)
    np.testing.assert_allclose([r, p, y], [roll, pitch, yaw], atol=1e-5)


def test_euler_zyx_composition_order():
    # q = Rz(yaw) Ry(pitch) Rx(roll)
    roll, pitch, yaw = 0.2, 0.4, -0.9
    qz = q.quat_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.array(yaw))
    qy = q.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.array(pitch))
    qx = q.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.array(roll))
    expect = q.quat_multiply(q.quat_multiply(qz, qy), qx)
    got = q.euler_zyx_to_quat(roll, pitch, yaw)
    dot = jnp.abs(jnp.sum(expect * got))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_yaw_about_up_y():
    # rotation about +y by 0.8 should give heading 0.8 in y-up convention
    qq = q.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.array(0.8))
    h = q.yaw_about_up(qq, up_dir=1)
    assert float(h) == pytest.approx(0.8, abs=1e-5)
    # heading is insensitive to roll/pitch composition after the yaw
    tilt = q.quat_from_axis_angle(jnp.array([1.0, 0.0, 0.0]), jnp.array(0.2))
    h2 = q.yaw_about_up(q.quat_multiply(qq, tilt), up_dir=1)
    assert float(h2) == pytest.approx(0.8, abs=1e-4)


def test_quat_derivative_matches_finite_difference():
    k = jax.random.PRNGKey(7)
    qq = rand_quat(k)
    w_local = jnp.array([0.3, -0.2, 0.5])
    dt = 1e-3  # large enough that fp32 rounding doesn't dominate the quotient
    q_next = q.quat_integrate_local(qq, w_local, dt)
    fd = (q_next - qq) / dt
    dq = q.angular_velocity_to_quat_derivative(qq, w_local)
    np.testing.assert_allclose(fd, dq, atol=1e-3)


def test_integrate_world_vs_local():
    k = jax.random.PRNGKey(8)
    qq = rand_quat(k)
    w_world = jnp.array([0.1, 0.7, -0.4])
    w_local = q.quat_rotate_inv(qq, w_world)
    q1 = q.quat_integrate_world(qq, w_world, 0.01)
    q2 = q.quat_integrate_local(qq, w_local, 0.01)
    dot = jnp.abs(jnp.sum(q1 * q2))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_diff_conventions():
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    q0, q1 = rand_quat(k1), rand_quat(k2)
    # global: q1 = diff ⊗ q0
    d = q.quat_diff(q0, q1)
    np.testing.assert_allclose(q.quat_multiply(d, q0), q1, atol=1e-5)
    # local: q1 = q0 ⊗ diff_rel
    dr = q.quat_diff_rel(q0, q1)
    np.testing.assert_allclose(q.quat_multiply(q0, dr), q1, atol=1e-5)


def test_butterworth_filter_dc_gain():
    from pfpn_tpu.math import so_fb_butter_lpf

    x = np.ones(50) * 3.0
    y = so_fb_butter_lpf(x, fs=30.0, fc=6.0)
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_butterworth_attenuates_high_freq():
    from pfpn_tpu.math import so_fb_butter_lpf

    t = np.arange(120) / 30.0
    lo = np.sin(2 * np.pi * 1.0 * t)
    hi = 0.5 * np.sin(2 * np.pi * 14.0 * t)
    y = so_fb_butter_lpf(lo + hi, fs=30.0, fc=6.0)
    # high-frequency content mostly removed
    assert np.abs(y - lo)[10:-10].max() < 0.12


def test_stacked_zyx_round_trip():
    """Spherical <-> stacked-3-revolute conversion (reference
    deepmimic.py:193-206 and 659-676) is a bijection: random joint
    quaternions + local angular velocities survive the round trip."""
    import jax
    from pfpn_tpu.math.euler_stack import (
        spherical_to_stacked_zyx, stacked_zyx_to_spherical)
    from pfpn_tpu.math import quaternion as quat

    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    # keep pitch away from the gimbal singularity (cos(pitch) != 0)
    q = quat.quat_normalize(jax.random.normal(k1, (64, 4)))
    roll, pitch, yaw = quat.quat_to_euler_zyx(q)
    ok = jnp.abs(jnp.cos(pitch)) > 0.2
    w = 3.0 * jax.random.normal(k2, (64, 3))

    angles, rates = spherical_to_stacked_zyx(q, w)
    q2, w2 = stacked_zyx_to_spherical(angles, rates)
    # quaternion double cover: compare up to sign
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(np.asarray((q2 * sign)[ok]),
                               np.asarray(q[ok]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w2[ok]), np.asarray(w[ok]),
                               rtol=1e-4, atol=1e-4)

    # and the reverse direction: hinge states -> spherical -> hinge states
    a0 = jnp.stack([yaw, pitch, roll], axis=-1)
    q3, w3 = stacked_zyx_to_spherical(a0, rates)
    a3, r3 = spherical_to_stacked_zyx(q3, w3)
    np.testing.assert_allclose(np.asarray(a3[ok]), np.asarray(a0[ok]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(r3[ok]), np.asarray(rates[ok]),
                               rtol=1e-4, atol=1e-4)

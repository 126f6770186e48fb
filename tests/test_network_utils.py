"""Value normalizer, recurrent/conv blocks, normalizers, mocap mirror."""

import jax
import jax.numpy as jnp
import numpy as np

from pfpn_tpu.networks import normalizer as norm_mod
from pfpn_tpu.networks import value_norm
from pfpn_tpu.networks.recurrent import (
    apply_conv, init_conv, init_lstm, lstm_cell, lstm_sequence, lstm_zero_state,
)


def test_obs_normalizer_moving_average_decay():
    st = norm_mod.init((2,))
    batch = jnp.ones((4, 2)) * 3.0
    # step 0: decay = 1/10 -> mean = 0.9*0 + ... wait decay=min(.9999,(1+0)/(10+0))=0.1
    st2 = norm_mod.update_moving_average(st, batch, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(st2.mean), [2.7, 2.7], atol=1e-6)
    # std decays toward batch std (0) but floors at 1e-6
    assert float(st2.std.min()) >= 1e-6


def test_obs_normalizer_welford_matches_numpy():
    st = norm_mod.init((3,))
    rng = np.random.RandomState(0)
    data = rng.randn(200, 3) * 2 + 1
    for i in range(0, 200, 50):
        st = norm_mod.update_welford(st, jnp.asarray(data[i:i + 50]))
    np.testing.assert_allclose(np.asarray(st.mean), data.mean(0), atol=2e-2)
    np.testing.assert_allclose(np.asarray(st.std), data.std(0), atol=2e-2)


def test_value_norm_preserves_outputs_on_update():
    st = value_norm.init()
    raw = jnp.asarray(1.3)
    before = value_norm.denormalize(st, raw)
    st2 = value_norm.update(st, jnp.asarray([5.0, 7.0, 6.0]), jnp.asarray(3))
    after = value_norm.denormalize(st2, raw)
    # the scale/offset compensation keeps the same network output mapping to
    # (nearly) the same value (actor_critic.py:353-356)
    np.testing.assert_allclose(float(after), float(before), rtol=1e-5)
    # while new targets normalize with the new stats
    t = value_norm.normalize_target(st2, jnp.asarray(6.0))
    assert abs(float(t)) < 3.0


def test_lstm_shapes_and_masking():
    params = init_lstm(jax.random.PRNGKey(0), 5, 8)
    st = lstm_zero_state(8, (3,))
    xs = jax.random.normal(jax.random.PRNGKey(1), (10, 3, 5))
    mask = jnp.ones((10, 3)).at[4:, 1].set(0.0)  # env 1 episode ends at t=4
    st2, hs = lstm_sequence(params, st, xs, mask)
    assert hs.shape == (10, 3, 8)
    np.testing.assert_allclose(np.asarray(hs[5:, 1]), 0.0, atol=1e-7)
    assert float(jnp.abs(hs[5:, 0]).max()) > 0


def test_conv_shapes():
    params = init_conv(jax.random.PRNGKey(0), 3, 8, 3)
    x = jnp.ones((2, 16, 16, 3))
    y = apply_conv(params, x, stride=2)
    assert y.shape == (2, 8, 8, 8)


def test_mocap_mirror_involution():
    from pfpn_tpu.envs.assets import HUMANOID_JOINT_PAIRS, humanoid_tree
    from pfpn_tpu.mocap import load_motion, sample_pose
    from pfpn_tpu.mocap.motion import mirror_pose

    tree = humanoid_tree()
    motion = load_motion(tree, "walk")
    pose = sample_pose(motion, jnp.asarray(0.3))
    m1 = mirror_pose(pose, tree, HUMANOID_JOINT_PAIRS)
    m2 = mirror_pose(m1, tree, HUMANOID_JOINT_PAIRS)
    # mirroring twice is the identity
    for f in pose._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(m2, f)), np.asarray(getattr(pose, f)),
            atol=1e-6, err_msg=f,
        )
    # lateral base position flipped
    np.testing.assert_allclose(
        float(m1.base_pos[2]), -float(pose.base_pos[2]), atol=1e-6
    )


def test_clip_value_straight_through_gradient():
    """clip_value uses the reference's clip_by_value_with_gradient semantics
    (networks/ops.py:4-9): hard clip forward, identity gradient backward, so
    a critic output outside the band still receives value-loss gradient."""
    import jax
    import jax.numpy as jnp

    from pfpn_tpu.networks.actor_critic import _clip_with_gradient

    f = lambda x: _clip_with_gradient(x, -1.0, 1.0)
    assert float(f(jnp.asarray(3.0))) == 1.0
    assert float(jax.grad(f)(jnp.asarray(3.0))) == 1.0  # not zero
    assert float(jax.grad(f)(jnp.asarray(0.5))) == 1.0

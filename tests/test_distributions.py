"""PFPN mixture distribution + resampling semantics (closed-form checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pfpn_tpu.distributions import categorical as cat
from pfpn_tpu.distributions import gaussian as gauss
from pfpn_tpu.distributions import particle as pfp
from pfpn_tpu.networks.heads import (
    ParticleHead, init_activation_stats, init_head,
)
from pfpn_tpu.networks.resample import resample


def test_gaussian_log_prob_closed_form():
    mu = jnp.array([[0.0, 1.0]])
    sigma = jnp.array([[1.0, 2.0]])
    x = jnp.array([[0.5, 0.0]])
    lp = gauss.log_prob(mu, sigma, x)
    expect = (
        -0.5 * 0.25 - 0.5 * np.log(2 * np.pi)
        - 0.5 * 0.25 - 0.5 * np.log(2 * np.pi) - np.log(2.0)
    )
    np.testing.assert_allclose(float(lp[0]), expect, rtol=1e-4)  # fp32


def test_gaussian_entropy():
    sigma = jnp.array([[1.0]])
    np.testing.assert_allclose(
        float(gauss.entropy(sigma)[0]), 0.5 * (1 + np.log(2 * np.pi)), rtol=1e-5
    )


def test_categorical_log_prob_and_entropy():
    logits = jnp.log(jnp.array([[[0.2, 0.8], [0.5, 0.5]]]))
    a = jnp.array([[1, 0]])
    lp = cat.log_prob(logits, a)
    np.testing.assert_allclose(float(lp[0]), np.log(0.8) + np.log(0.5), rtol=1e-5)
    ent = cat.entropy(logits)
    np.testing.assert_allclose(
        np.asarray(ent[0]),
        [-(0.2 * np.log(0.2) + 0.8 * np.log(0.8)), np.log(2)], rtol=1e-5,
    )


def test_mixture_log_prob_single_component():
    # one dominant particle -> log_prob reduces to that Gaussian
    logits = jnp.array([[[100.0, 0.0]]])  # dim 0 picks particle 0
    loc = jnp.array([[0.5, -0.5]])
    scale = jnp.array([[0.3, 0.3]])
    x = jnp.array([[0.4]])
    lp = pfp.log_prob(logits, loc, scale, x)
    expect = gauss.log_prob(jnp.array([[0.5]]), jnp.array([[0.3]]), x)
    np.testing.assert_allclose(float(lp[0]), float(expect[0]), rtol=1e-4)


def test_mixture_log_prob_is_mixture():
    logits = jnp.zeros((1, 1, 2))  # equal weights
    loc = jnp.array([[-1.0, 1.0]])
    scale = jnp.array([[0.5, 0.5]])
    x = jnp.array([[0.0]])
    lp = pfp.log_prob(logits, loc, scale, x)
    comp = np.exp(-0.5 * (2.0 ** 2)) / (0.5 * np.sqrt(2 * np.pi))
    np.testing.assert_allclose(float(jnp.exp(lp[0])), comp, rtol=1e-4)


def test_mixture_sample_statistics():
    key = jax.random.PRNGKey(0)
    n = 20000
    logits = jnp.broadcast_to(jnp.log(jnp.array([0.25, 0.75])), (n, 1, 2))
    loc = jnp.array([[-1.0, 1.0]])
    scale = jnp.array([[0.1, 0.1]])
    a, idx = pfp.sample(key, logits, loc, scale)
    frac = float(jnp.mean((idx == 1).astype(jnp.float32)))
    assert abs(frac - 0.75) < 0.02
    mean = float(jnp.mean(a))
    np.testing.assert_allclose(mean, 0.25 * (-1) + 0.75 * 1, atol=0.05)


def test_mixture_rsample_gradients_flow():
    """Straight-through masks route gradients to all particles and logits."""
    key = jax.random.PRNGKey(1)
    logits = jnp.zeros((4, 2, 3))
    loc = jnp.array([[-0.5, 0.0, 0.5]] * 2)
    scale = jnp.full((2, 3), 0.2)

    def f(logits, loc, scale):
        a, pre = pfp.rsample_squashed(key, logits, loc, scale)
        return jnp.sum(a)

    g_logits, g_loc, g_scale = jax.grad(f, argnums=(0, 1, 2))(logits, loc, scale)
    assert float(jnp.abs(g_logits).sum()) > 0
    assert float(jnp.abs(g_loc).sum()) > 0
    assert float(jnp.abs(g_scale).sum()) > 0


def test_squashed_log_prob_matches_change_of_variables():
    key = jax.random.PRNGKey(2)
    logits = jnp.zeros((1, 1, 4))
    loc = jnp.array([[-2.0, -0.5, 0.5, 2.0]])
    scale = jnp.full((1, 4), 0.5)
    a, pre = pfp.rsample_squashed(key, logits, loc, scale)
    lp = pfp.log_prob(logits, loc, scale, a, squash=True, pre_tanh=pre)
    # numerical check: integrate density over a grid ≈ 1
    grid = jnp.linspace(-0.999, 0.999, 4001)[:, None]
    lps = pfp.log_prob(
        jnp.zeros((4001, 1, 4)), loc, scale, grid, squash=True
    )
    integral = float(jnp.trapezoid(jnp.exp(lps), grid[:, 0]))
    np.testing.assert_allclose(integral, 1.0, atol=0.01)
    assert np.isfinite(float(lp[0]))


def test_mode_picks_argmax_particle():
    logits = jnp.array([[[0.0, 3.0, 0.0]]])
    loc = jnp.array([[-1.0, 0.3, 1.0]])
    a = pfp.mode(logits, loc)
    np.testing.assert_allclose(float(a[0, 0]), 0.3, rtol=1e-6)


def test_particle_head_grid_init():
    cfg = ParticleHead(action_dim=2, particles=5)
    params = init_head(jax.random.PRNGKey(0), cfg, 16)
    loc = np.asarray(params["particles"])
    # endpoints-inclusive grid on [-1, 1] (a2c.py:488)
    np.testing.assert_allclose(loc[0], np.linspace(-1, 1, 5), atol=1e-6)
    std = np.exp(np.asarray(params["particles_log_std"]))
    np.testing.assert_allclose(std, np.full((2, 5), 0.5), atol=1e-6)


def test_particle_head_squash_grid_init():
    cfg = ParticleHead(action_dim=1, particles=10, squash=True)
    params = init_head(jax.random.PRNGKey(0), cfg, 16)
    loc = np.asarray(params["particles"])[0]
    # midpoint grid in tanh space (a2c.py:486)
    expect = np.arctanh(-1 + 2 / 10 * (np.arange(10) + 0.5))
    np.testing.assert_allclose(loc, expect, atol=1e-5)


def test_resample_replaces_dead_particles():
    cfg = ParticleHead(action_dim=2, particles=6, resample=-1,
                       resample_interval=10)
    params = init_head(jax.random.PRNGKey(0), cfg, 8)
    stats = init_activation_stats(cfg)
    # particle (0, 0) dead; all others active
    max_active = jnp.full((2, 6), 0.5).at[0, 0].set(0.0)
    sum_active = jnp.full((2, 6), 100.0).at[0, 0].set(0.0)
    stats = {**stats, "max_active": max_active, "sum_active": sum_active}
    old_loc = np.asarray(params["particles"]).copy()
    old_b = np.asarray(params["fc_policy"]["b"]).reshape(2, 6).copy()
    new = resample(cfg, params, stats, jax.random.PRNGKey(3))
    new_loc = np.asarray(new["particles"])
    new_b = np.asarray(new["fc_policy"]["b"]).reshape(2, 6)
    # dead particle moved near an alive one (within its std + jitter)
    assert abs(new_loc[0, 0] - old_loc[0, 0]) > 1e-4
    # all alive particles untouched
    np.testing.assert_allclose(new_loc[1], old_loc[1], atol=1e-7)
    np.testing.assert_allclose(new_loc[0, 1:], old_loc[0, 1:], atol=1e-7)
    # weight mass split: target column's bias decreased by log(2)
    changed = np.where(np.abs(new_b[0] - old_b[0]) > 1e-6)[0]
    assert 0 in changed  # the dead column was rewritten
    tgt_cols = [c for c in changed if c != 0]
    assert len(tgt_cols) == 1
    t = tgt_cols[0]
    np.testing.assert_allclose(new_b[0, t], old_b[0, t] - np.log(2.0), atol=1e-5)
    np.testing.assert_allclose(new_b[0, 0], new_b[0, t], atol=1e-6)
    # dead column weights copied from target column
    w = np.asarray(params["fc_policy"]["w"]).reshape(8, 2, 6)
    w_new = np.asarray(new["fc_policy"]["w"]).reshape(8, 2, 6)
    np.testing.assert_allclose(w_new[:, 0, 0], w[:, 0, t], atol=1e-7)


def test_resample_topk_path():
    # resample=k > 0: candidates drawn uniformly from the k most active
    # particles (a2c.py:405-408), not activation-proportionally.
    cfg = ParticleHead(action_dim=1, particles=6, resample=2,
                       resample_interval=10)
    params = init_head(jax.random.PRNGKey(0), cfg, 8)
    stats = init_activation_stats(cfg)
    # slot 0 dead; slots 4 and 5 dominate average activation -> top-2
    max_active = jnp.array([[0.0, 0.5, 0.5, 0.5, 0.5, 0.5]])
    sum_active = jnp.array([[0.0, 1.0, 2.0, 3.0, 100.0, 90.0]])
    stats = {**stats, "max_active": max_active, "sum_active": sum_active}
    old_loc = np.asarray(params["particles"]).copy()
    old_b = np.asarray(params["fc_policy"]["b"]).reshape(1, 6).copy()
    w = np.asarray(params["fc_policy"]["w"]).reshape(8, 1, 6).copy()
    new = resample(cfg, params, stats, jax.random.PRNGKey(7))
    new_loc = np.asarray(new["particles"])
    new_b = np.asarray(new["fc_policy"]["b"]).reshape(1, 6)
    w_new = np.asarray(new["fc_policy"]["w"]).reshape(8, 1, 6)
    # exactly one bias column besides the dead one changed, and it is a
    # top-2 slot whose mass was halved (log(2) split)
    changed = np.where(np.abs(new_b[0] - old_b[0]) > 1e-6)[0]
    tgt_cols = [c for c in changed if c != 0]
    assert len(tgt_cols) == 1 and tgt_cols[0] in (4, 5)
    t = tgt_cols[0]
    np.testing.assert_allclose(new_b[0, t], old_b[0, t] - np.log(2.0),
                               atol=1e-5)
    # dead slot copied the target's logit column and mean (+- std jitter)
    np.testing.assert_allclose(w_new[:, 0, 0], w[:, 0, t], atol=1e-7)
    std_t = float(np.exp(np.asarray(
        params["particles_log_std"])[0, t]))
    assert abs(new_loc[0, 0] - old_loc[0, t]) <= std_t + 1e-3
    # alive particles untouched
    np.testing.assert_allclose(new_loc[0, 1:], old_loc[0, 1:], atol=1e-7)


def test_maybe_resample_counter():
    from pfpn_tpu.networks.resample import maybe_resample

    cfg = ParticleHead(action_dim=1, particles=4, resample=-1,
                       resample_interval=3)
    params = init_head(jax.random.PRNGKey(0), cfg, 8)
    stats = init_activation_stats(cfg)
    stats = {**stats, "sum_active": jnp.ones((1, 4)),
             "max_active": jnp.ones((1, 4))}
    key = jax.random.PRNGKey(0)
    for i in range(2):
        params, stats = maybe_resample(cfg, params, stats, key)
        assert float(stats["train_flag"]) == i + 1
    params, stats = maybe_resample(cfg, params, stats, key)
    # interval hit -> counter and accumulators reset
    assert float(stats["train_flag"]) == 0.0
    assert float(stats["max_active"].sum()) == 0.0

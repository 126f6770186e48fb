"""Policy heads: Gaussian, factored-categorical, and particle-filtering.

Each head is a frozen config dataclass + pure functions over a params dict.
They mirror the reference's three policy families (SURVEY.md §2:
``Continuous*``, ``Discrete*``, ``ParticleFiltering*`` networks):

* Gaussian (a2c.py:91-278): fixed / trainable-variable / state-dependent
  sigma, optional tanh-bounded log-sigma, optional tanh squashing with
  bound denormalization;
* Categorical (a2c.py:281-307): one logit layer reshaped [B, D, N];
* Particle (a2c.py:310-559): trainable particle grids loc/log-std [D, N]
  plus a logit layer; see distributions/particle.py for the distribution
  semantics and networks/resample.py for particle resampling.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..distributions import categorical as cat
from ..distributions import gaussian as gauss
from ..distributions import particle as pfp
from .mlp import apply_linear, init_linear, truncated_normal_init


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GaussianHead:
    action_dim: int
    init_sigma: Optional[float] = None
    fixed_sigma: bool = False
    variabilize_sigma: bool = False
    max_sigma: Optional[float] = None
    sigma_eps: float = 2e-9
    squash: bool = False
    # action bounds for (de)normalization when squashing (a2c.py:246-278)
    action_low: Optional[np.ndarray] = None
    action_high: Optional[np.ndarray] = None


@dataclasses.dataclass(frozen=True)
class CategoricalHead:
    action_dim: int   # number of action dimensions
    bins: int         # particles per dimension (DiscreteActionWrapper n)


@dataclasses.dataclass(frozen=True)
class ParticleHead:
    action_dim: int
    particles: int = 35
    init_sigma: Optional[float] = None
    fixed_sigma: bool = False
    squash: bool = False            # tanh-squash before mixture (SAC path)
    resample: int = -1
    resample_interval: int = 2000
    resample_threshold: Optional[float] = None
    action_low: Optional[np.ndarray] = None
    action_high: Optional[np.ndarray] = None


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_head(key, cfg, feat_dim: int) -> dict:
    if isinstance(cfg, GaussianHead):
        k1, k2 = jax.random.split(key)
        params = {"fc_mu": init_linear(k1, feat_dim, cfg.action_dim)}
        if not cfg.fixed_sigma:
            if cfg.variabilize_sigma:
                init_ls = np.log(cfg.init_sigma) if cfg.init_sigma else 0.0
                params["log_sigma"] = jnp.full((1, cfg.action_dim), init_ls)
            elif cfg.init_sigma:
                # state-dependent sigma initialized at init_sigma: zero
                # weights + log(init_sigma) bias (a2c.py:182-187)
                params["fc_log_sigma"] = {
                    "w": jnp.zeros((feat_dim, cfg.action_dim)),
                    "b": jnp.full(cfg.action_dim, float(np.log(cfg.init_sigma))),
                }
            else:
                params["fc_log_sigma"] = init_linear(k2, feat_dim, cfg.action_dim)
        return params

    if isinstance(cfg, CategoricalHead):
        return {"fc_policy": init_linear(key, feat_dim, cfg.action_dim * cfg.bins)}

    if isinstance(cfg, ParticleHead):
        d, n = cfg.action_dim, cfg.particles
        u, l = 1.0, -1.0
        if cfg.squash:
            loc_t = l + (u - l) / n * (np.arange(n) + 0.5)   # midpoints
        else:
            loc_t = l + (u - l) / (n - 1) * np.arange(n)     # endpoints incl.
        loc_t = np.broadcast_to(loc_t, (d, n)).copy()

        if cfg.init_sigma:
            std = np.full((d, n), float(cfg.init_sigma))
            if cfg.squash:
                loc_raw = np.arctanh(loc_t)
                std = np.maximum(
                    loc_raw - np.arctanh(np.maximum(1e-6 - 1, loc_t - std)),
                    np.arctanh(np.minimum(1 - 1e-6, loc_t + std)) - loc_raw,
                )
                loc = loc_raw
            else:
                loc = loc_t
        else:
            if cfg.squash:
                assert n > 3
                loc = np.arctanh(loc_t)
                # std = distance to farthest neighbouring particle in atanh
                # space (a2c.py:501-511)
                std = np.empty((d, n))
                for i in range(d):
                    for j in range(n):
                        d0 = loc[i][j] - loc[i][max(0, j - 1)]
                        d1 = loc[i][min(n - 1, j + 1)] - loc[i][j]
                        std[i][j] = max(d0, d1)
            else:
                loc = loc_t
                std = np.full((d, n), (u - l) / (n - 1))

        params = {
            "fc_policy": init_linear(key, feat_dim, d * n),
            "particles": jnp.asarray(loc, dtype=jnp.float32),
        }
        if cfg.fixed_sigma:
            params["particles_log_std_fixed"] = jnp.asarray(np.log(std), dtype=jnp.float32)
        else:
            params["particles_log_std"] = jnp.asarray(np.log(std), dtype=jnp.float32)
        return params

    raise TypeError(cfg)


def init_activation_stats(cfg: ParticleHead) -> dict:
    """PFPN resampling accumulators (a2c.py:346-369): per-particle max/sum
    activation over forward passes + the optimizer-step counter."""
    d, n = cfg.action_dim, cfg.particles
    return {
        "max_active": jnp.zeros((d, n)),
        "sum_active": jnp.zeros((d, n)),
        "train_flag": jnp.zeros(()),
    }


# ---------------------------------------------------------------------------
# distribution parameters from features
# ---------------------------------------------------------------------------

def _particle_loc_scale(cfg: ParticleHead, params):
    loc = params["particles"]
    if cfg.fixed_sigma:
        scale = jnp.exp(params["particles_log_std_fixed"])
    else:
        scale = jnp.exp(jnp.clip(params["particles_log_std"], -20.0, 2.0))
    return loc, scale


def head_dist(cfg, params, feat):
    """Returns the distribution parameter tuple for the head type."""
    if isinstance(cfg, GaussianHead):
        mu = apply_linear(params["fc_mu"], feat)
        if cfg.fixed_sigma:
            sigma = jnp.full_like(mu, cfg.init_sigma)
        elif cfg.variabilize_sigma:
            log_sigma = jnp.broadcast_to(params["log_sigma"], mu.shape)
            sigma = jnp.exp(log_sigma) + cfg.sigma_eps
        else:
            log_sigma = apply_linear(params["fc_log_sigma"], feat)
            if cfg.max_sigma:
                offset = 0.5 * (np.log(cfg.max_sigma) + np.log(cfg.sigma_eps))
                scale_ = 0.5 * (np.log(cfg.max_sigma) - np.log(cfg.sigma_eps))
                sigma = jnp.exp(jnp.tanh(log_sigma) * scale_ + offset)
            else:
                sigma = jnp.exp(log_sigma) + cfg.sigma_eps
        return mu, sigma

    if isinstance(cfg, CategoricalHead):
        logits = apply_linear(params["fc_policy"], feat)
        return (logits.reshape(feat.shape[:-1] + (cfg.action_dim, cfg.bins)),)

    if isinstance(cfg, ParticleHead):
        logits = apply_linear(params["fc_policy"], feat)
        logits = logits.reshape(feat.shape[:-1] + (cfg.action_dim, cfg.particles))
        loc, scale = _particle_loc_scale(cfg, params)
        return logits, loc, scale

    raise TypeError(cfg)


# ---------------------------------------------------------------------------
# bound (de)normalization for squashed heads (a2c.py:246-278)
# ---------------------------------------------------------------------------

def denormalize_action(cfg, a):
    if getattr(cfg, "squash", False) and cfg.action_low is not None:
        scale = 0.5 * (np.asarray(cfg.action_high) - np.asarray(cfg.action_low))
        offset = 0.5 * (np.asarray(cfg.action_high) + np.asarray(cfg.action_low))
        return a * jnp.asarray(scale, dtype=a.dtype) + jnp.asarray(offset, dtype=a.dtype)
    return a


def normalize_action(cfg, a):
    if getattr(cfg, "squash", False) and cfg.action_low is not None:
        scale = 0.5 * (np.asarray(cfg.action_high) - np.asarray(cfg.action_low))
        offset = 0.5 * (np.asarray(cfg.action_high) + np.asarray(cfg.action_low))
        return (a - jnp.asarray(offset, dtype=a.dtype)) / jnp.asarray(scale, dtype=a.dtype)
    return a


# ---------------------------------------------------------------------------
# unified sampling / scoring API
# ---------------------------------------------------------------------------

def sample_with_log_prob(cfg, params, feat, key):
    """Returns (env_action, log_prob, aux) — aux carries pre-tanh values and
    PFPN activation probabilities for the accumulators."""
    dist = head_dist(cfg, params, feat)
    if isinstance(cfg, GaussianHead):
        mu, sigma = dist
        x = gauss.sample(key, mu, sigma)
        if cfg.squash:
            lp = gauss.log_prob_squashed(mu, sigma, x)
            a = denormalize_action(cfg, jnp.tanh(x))
        else:
            lp = gauss.log_prob(mu, sigma, x)
            a = x
        return a, lp, {}

    if isinstance(cfg, CategoricalHead):
        (logits,) = dist
        a = cat.sample(key, logits)
        return a, cat.log_prob(logits, a), {}

    if isinstance(cfg, ParticleHead):
        logits, loc, scale = dist
        aux = {"probs": pfp.probs(logits)}
        if cfg.squash:
            a_t, pre = pfp.rsample_squashed(key, logits, loc, scale)
            lp = pfp.log_prob(logits, loc, scale, a_t, squash=True, pre_tanh=pre)
            return denormalize_action(cfg, a_t), lp, {"pre_tanh": pre, **aux}
        a, _ = pfp.sample(key, logits, loc, scale)
        return a, pfp.log_prob(logits, loc, scale, a), aux

    raise TypeError(cfg)


def log_prob_of(cfg, params, feat, env_action):
    dist = head_dist(cfg, params, feat)
    if isinstance(cfg, GaussianHead):
        mu, sigma = dist
        if cfg.squash:
            pre = gauss.atanh_safe(normalize_action(cfg, env_action))
            return gauss.log_prob_squashed(mu, sigma, pre)
        return gauss.log_prob(mu, sigma, env_action)
    if isinstance(cfg, CategoricalHead):
        (logits,) = dist
        return cat.log_prob(logits, env_action)
    if isinstance(cfg, ParticleHead):
        logits, loc, scale = dist
        if cfg.squash:
            return pfp.log_prob(
                logits, loc, scale, normalize_action(cfg, env_action), squash=True
            )
        return pfp.log_prob(logits, loc, scale, env_action)
    raise TypeError(cfg)


def entropy_of(cfg, params, feat):
    dist = head_dist(cfg, params, feat)
    if isinstance(cfg, GaussianHead):
        return gauss.entropy(dist[1])
    if isinstance(cfg, CategoricalHead):
        return jnp.sum(cat.entropy(dist[0]), axis=-1)
    if isinstance(cfg, ParticleHead):
        return jnp.sum(pfp.entropy(dist[0]), axis=-1)
    raise TypeError(cfg)


def deterministic_action(cfg, params, feat):
    dist = head_dist(cfg, params, feat)
    if isinstance(cfg, GaussianHead):
        mu = dist[0]
        if cfg.squash:
            return denormalize_action(cfg, jnp.tanh(mu))
        return mu
    if isinstance(cfg, CategoricalHead):
        return cat.mode(dist[0])
    if isinstance(cfg, ParticleHead):
        logits, loc, scale = dist
        a = pfp.mode(logits, loc, scale, squash=cfg.squash)
        return denormalize_action(cfg, a) if cfg.squash else a
    raise TypeError(cfg)


def update_activation_stats(stats: dict, probs: jnp.ndarray) -> dict:
    """Fold a forward pass's particle weights into the accumulators
    (a2c.py:356-365). probs: [..., D, N] — reduced over all batch axes."""
    batch_axes = tuple(range(probs.ndim - 2))
    return {
        **stats,
        "max_active": jnp.maximum(stats["max_active"], jnp.max(probs, axis=batch_axes)),
        "sum_active": stats["sum_active"] + jnp.sum(probs, axis=batch_axes),
    }

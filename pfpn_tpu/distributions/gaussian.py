"""Diagonal Gaussian policy distribution (optionally tanh-squashed).

Functional equivalents of the reference's TFP-based Gaussian head
(networks/actor_critic/a2c.py:91-278): log-prob with tanh Jacobian
correction (a2c.py:234-238), reparameterized sampling, entropy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_2PI = jnp.log(2.0 * jnp.pi)
LOG2 = jnp.log(2.0)


def log_prob(mu, sigma, value):
    """Element-wise Normal log-density, summed over the last axis."""
    z = (value - mu) / sigma
    lp = -0.5 * (z * z + _LOG_2PI) - jnp.log(sigma)
    return jnp.sum(lp, axis=-1)


def tanh_correction(pre_tanh):
    """log|d tanh(x)/dx| summed over the action axis, the numerically stable
    form used by the reference (a2c.py:238): 2*(log2 - x - softplus(-2x))."""
    return jnp.sum(2.0 * (LOG2 - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh)), axis=-1)


def log_prob_squashed(mu, sigma, pre_tanh):
    return log_prob(mu, sigma, pre_tanh) - tanh_correction(pre_tanh)


def sample(key, mu, sigma):
    return mu + sigma * jax.random.normal(key, mu.shape)


def entropy(sigma):
    """Per-dimension entropy, summed over the action axis."""
    return jnp.sum(0.5 * (1.0 + _LOG_2PI) + jnp.log(sigma), axis=-1)


def atanh_safe(x, eps: float = 1e-6):
    return jnp.arctanh(jnp.clip(x, -1.0 + eps, 1.0 - eps))

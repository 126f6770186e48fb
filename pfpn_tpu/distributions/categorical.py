"""Factored categorical distribution over per-dimension logits [..., D, N].

Functional equivalent of the reference discrete head
(networks/actor_critic/a2c.py:281-307): one logit layer reshaped to
[B, dims, n], independent categorical per action dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_prob(logits, actions):
    """actions: integer [..., D]; returns summed log-prob [...]."""
    lp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(lp, actions[..., None].astype(jnp.int32), axis=-1)
    return jnp.sum(picked[..., 0], axis=-1)


def sample(key, logits):
    return jax.random.categorical(key, logits, axis=-1)


def mode(logits):
    return jnp.argmax(logits, axis=-1)


def entropy(logits):
    """Per-dimension categorical entropy [..., D] (reference utils.py:146-151
    numerically stable form)."""
    v = logits - jnp.max(logits, axis=-1, keepdims=True)
    s0 = jnp.exp(v)
    s1 = jnp.sum(s0, axis=-1, keepdims=True)
    p = s0 / s1
    return jnp.sum(p * (jnp.log(s1) - v), axis=-1)

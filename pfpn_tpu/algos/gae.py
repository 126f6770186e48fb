"""Return / advantage estimators as lax.scan reverse recurrences.

Rebuild of the reference host-side NumPy helpers (networks/utils.py:5-15,
a2c.py:23-49) as in-jit scans over the time axis, vectorized over envs.

Time-major layout [T, B]; per-step flags:
  terminated[t] — true env terminal (bootstrap 0)
  done[t]       — terminal OR truncation OR unroll boundary (stop GAE carry)
  bootstrap[t]  — V(s_{t+1}) evaluated on the *pre-reset* next state
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def discount(values, factor, bootstrap):
    """Reverse discounted sum (reference utils.py:5-15)."""

    def body(carry, v):
        carry = v + factor * carry
        return carry, carry

    _, out = jax.lax.scan(body, bootstrap, values, reverse=True)
    return out


def gae(rewards, values, next_values, terminated, done, gamma, lambd):
    """Generalized advantage estimation with per-step episode boundaries.

    Matches the reference semantics (ppo.py:50-73 + a2c.py:30-40): the TD
    error bootstraps with 0 on true terminals and with V(next pre-reset
    state) on truncation/unroll end; the GAE carry resets across episode
    boundaries (the reference segments by buffer_stamp).
    """
    not_term = 1.0 - terminated.astype(rewards.dtype)
    not_done = 1.0 - done.astype(rewards.dtype)
    delta = rewards + gamma * not_term * next_values - values

    def body(carry, x):
        d, nd = x
        carry = d + gamma * lambd * nd * carry
        return carry, carry

    _, adv = jax.lax.scan(body, jnp.zeros_like(delta[-1]), (delta, not_done),
                          reverse=True)
    return adv


def td_lambda_targets(rewards, values, next_values, terminated, done,
                      gamma, lambd):
    adv = gae(rewards, values, next_values, terminated, done, gamma, lambd)
    return adv + values, adv

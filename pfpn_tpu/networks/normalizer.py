"""Online observation/value normalizers as carried state.

Functional rebuild of the reference ``online_normalizer``
(networks/utils.py:46-82). Both variants are provided:

* moving-average (the one the reference actually uses for states,
  actor_critic.py:320-321): decay = min(0.9999, (1+s)/(10+s)) with s the
  global optimizer step; std tracks a decayed average of batch stds;
* Welford parallel-merge (utils.py:69-80).

State lives outside the trainable params; updates happen at train time
(UPDATE_OPS semantics — only the first optimization epoch updates, matching
sync_model.py:103-149's first-epoch-only hooks).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class NormalizerState(NamedTuple):
    mean: jnp.ndarray
    std: jnp.ndarray
    count: jnp.ndarray   # Welford count, or unused for moving-average


def init(shape) -> NormalizerState:
    return NormalizerState(
        mean=jnp.zeros(shape),
        std=jnp.ones(shape),
        count=jnp.asarray(1e-4),
    )


def normalize(state: NormalizerState, x, clip: float | None = 5.0):
    y = (x - state.mean) / state.std
    if clip:
        y = jnp.clip(y, -clip, clip)
    return y


def update_moving_average(state: NormalizerState, batch, global_step) -> NormalizerState:
    """Reference utils.py:60-68."""
    s = global_step.astype(jnp.float32)
    decay = jnp.minimum(0.9999, (1.0 + s) / (10.0 + s))
    m = jnp.mean(batch, axis=0)
    v = jnp.var(batch, axis=0)
    new_mean = decay * state.mean + (1.0 - decay) * m
    new_std = jnp.maximum(1e-6, decay * state.std + (1.0 - decay) * jnp.sqrt(v))
    return NormalizerState(new_mean, new_std, state.count)


def update_welford(state: NormalizerState, batch) -> NormalizerState:
    """Reference utils.py:69-80 (parallel Welford merge)."""
    batch_mean = jnp.mean(batch, axis=0)
    batch_var = jnp.var(batch, axis=0)
    batch_count = jnp.asarray(batch.shape[0], dtype=jnp.float32)
    delta = batch_mean - state.mean
    new_count = state.count + batch_count
    m_a = jnp.square(state.std) * state.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + jnp.square(delta) * state.count * batch_count / new_count
    new_std = jnp.maximum(1e-6, jnp.sqrt(m2 / new_count))
    new_mean = state.mean + delta * batch_count / new_count
    return NormalizerState(new_mean, new_std, new_count)

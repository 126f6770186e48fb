"""Env wrappers (functional).

DiscreteActionWrapper: quantizes each continuous action dimension into n
evenly spaced values (reference settings/wrappers.py:1-17), turning the task
into a factored-discrete control problem for the Discrete* baselines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DiscreteActionWrapper:
    """action[i] in {0..n-1} per dimension -> continuous value
    low + i*(high-low)/(n-1) (reference wrappers.py:7)."""

    def __init__(self, env, n: int):
        self.env = env
        self.n = n
        low = np.asarray(env.action_low, dtype=np.float32)
        high = np.asarray(env.action_high, dtype=np.float32)
        # (dims, n) lookup table
        steps = np.arange(n, dtype=np.float32)[None, :] / (n - 1)
        self.table = low[:, None] + steps * (high - low)[:, None]
        self.action_size = env.action_size
        self.observation_size = env.observation_size
        # discrete spaces drop low/high (wrappers.py:10-12)
        self.action_low = None
        self.action_high = None

    def _continuous(self, a):
        """Single unbatched action (dims,) -> continuous (dims,)."""
        tbl = jnp.asarray(self.table)
        return jnp.take_along_axis(tbl, a.astype(jnp.int32)[:, None], axis=-1)[:, 0]

    def reset(self, key):
        return self.env.reset(key)

    def reset_batch(self, keys):
        return self.env.reset_batch(keys)

    def step(self, state, action):
        return self.env.step(state, self._continuous(action))

    def step_batch(self, states, actions):
        return self.env.step_batch(states, jax.vmap(self._continuous)(actions))

    def step_autoreset(self, states, actions, keys):
        return self.env.step_autoreset(states, jax.vmap(self._continuous)(actions), keys)

    def observe(self, state):
        return self.env.observe(state)

    def __getattr__(self, name):
        return getattr(self.env, name)

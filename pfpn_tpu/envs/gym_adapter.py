"""Stateful gym-style adapter over the pure-function DeepMimic env.

Rebuilds the reference's minimal gym API surface (envs/gym_api/env.py:1-29,
envs/gym_api/spaces.py:1-65): a mutable-attribute ``Box`` space and an ``Env``
with ``reset() -> obs`` / ``step(a) -> (obs, reward, done, info)``, backed by
the jitted single-env pure functions.  This is the host-side compatibility
surface — training never uses it (rollouts are fused in-jit); it exists so a
user of the reference can drive one environment interactively exactly as
before (the BASELINE north star: "preserves the gym_api scene/state
interface").

Semantics preserved:
* ``info["TimeLimit.truncated"]`` is True when the episode ended by the 20 s
  limit rather than a fall (reference deepmimic.py:549-550; gym's TimeLimit
  wrapper contract, models/workers/base_worker.py:152-154 ``overtime()``);
* ``Box`` keeps ``shape``/``low``/``high`` as plain mutable attributes so
  wrappers like the reference's DiscreteActionWrapper can rewrite them
  (settings/wrappers.py:7-12);
* ``seed()`` reseeds the reset-phase RNG stream.
"""

from __future__ import annotations

import math

import jax
import numpy as np


class Space:
    """Minimal space base (reference envs/gym_api/spaces.py:5-21)."""

    def __init__(self, shape=None):
        self.np_random = np.random.RandomState()
        self.shape = shape

    def contains(self, x):
        raise NotImplementedError

    def sample(self):
        raise NotImplementedError


class Box(Space):
    """Mutable-attribute Box (reference envs/gym_api/spaces.py:51-65)."""

    def __init__(self, low=None, high=None, shape=None):
        self.low = low
        self.high = high
        if shape is None:
            shape = np.array(self.low).shape
        super().__init__(shape)

    def contains(self, x):
        x = np.asarray(x)
        return bool(np.all(x >= self.low) and np.all(x <= self.high))

    def sample(self):
        low = np.broadcast_to(np.asarray(self.low, np.float64), self.shape)
        high = np.broadcast_to(np.asarray(self.high, np.float64), self.shape)
        if np.all(np.isfinite(low)) and np.all(np.isfinite(high)):
            return self.np_random.uniform(low, high)
        # unbounded dims (the adapter's observation_space is +-inf):
        # gym's Box semantics — normal for two-sided-unbounded,
        # exponential offsets for half-bounded
        out = self.np_random.normal(size=self.shape)
        lo_fin, hi_fin = np.isfinite(low), np.isfinite(high)
        both = lo_fin & hi_fin
        out = np.where(both, self.np_random.uniform(
            np.where(both, low, 0.0), np.where(both, high, 1.0)), out)
        only_lo = lo_fin & ~hi_fin
        out = np.where(only_lo, np.where(lo_fin, low, 0.0)
                       + self.np_random.exponential(size=self.shape), out)
        only_hi = ~lo_fin & hi_fin
        out = np.where(only_hi, np.where(hi_fin, high, 0.0)
                       - self.np_random.exponential(size=self.shape), out)
        return out

    def __repr__(self):
        return "Box({})".format(self.shape)

    def __eq__(self, rhs):
        return (np.array_equal(self.low, getattr(rhs, "low", None))
                and np.array_equal(self.high, getattr(rhs, "high", None)))


class Env:
    """Stateful env base (reference envs/gym_api/env.py:1-29)."""

    name = None
    action_space = None
    observation_space = None
    reward_range = (-math.inf, math.inf)

    def step(self, action):
        raise NotImplementedError

    def reset(self):
        raise NotImplementedError

    def render(self):
        raise NotImplementedError

    def close(self):
        return

    def seed(self, seed):
        return

    def __str__(self):
        if self.name is None:
            return "<{} instance>".format(type(self).__name__)
        return self.name


class GymEnv(Env):
    """One stateful environment over the functional DeepMimicEnv.

    ``env`` is a :class:`pfpn_tpu.envs.DeepMimicEnv` (or a functional wrapper
    with the same reset/step surface).  reset/step are jit-compiled once and
    reused; episode state lives on this object like the reference's
    PyBullet-backed env.
    """

    def __init__(self, env, seed: int = 0):
        self.env = env
        self.name = f"DeepMimic{env.motion_name.capitalize()}-v0" \
            if hasattr(env, "motion_name") else None
        if getattr(env, "action_low", None) is not None:
            self.action_space = Box(
                low=np.asarray(env.action_low),
                high=np.asarray(env.action_high),
            )
        else:  # discrete-wrapped: shape only, low/high dropped
            self.action_space = Box(shape=[env.action_size])
            self.action_space.low = None
            self.action_space.high = None
        obs_dim = env.observation_size
        self.observation_space = Box(
            low=np.full(obs_dim, -np.inf, dtype=np.float32),
            high=np.full(obs_dim, np.inf, dtype=np.float32),
        )
        self.reward_range = (0.0, 1.0)  # deepmimic.py:594-753
        self._reset_fn = jax.jit(env.reset)
        self._step_fn = jax.jit(env.step)
        self._state = None
        self._key = jax.random.PRNGKey(seed)

    def seed(self, seed):
        self._key = jax.random.PRNGKey(seed)

    def reset(self):
        self._key, k = jax.random.split(self._key)
        self._state, obs = self._reset_fn(k)
        return np.asarray(obs)

    def step(self, action):
        assert self._state is not None, "call reset() before step()"
        res = self._step_fn(
            self._state, np.asarray(action, dtype=np.float32))
        self._state = res.state
        info = {"TimeLimit.truncated": bool(res.truncated)}
        return (np.asarray(res.obs), float(res.reward), bool(res.done), info)

    def render(self):
        # parity surface: the TPU rebuild renders via trajectory export
        # (tools/view_trajectory.py) instead of a live GUI
        return None

    def __getattr__(self, name):
        # guard against infinite recursion when 'env' itself is missing
        # (copy/pickle create instances without running __init__)
        if name == "env":
            raise AttributeError(name)
        return getattr(self.env, name)

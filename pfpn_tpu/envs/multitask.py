"""Multi-task DeepMimic batch: one vmapped env batch spanning several motions.

There is no reference counterpart (the reference trains one motion per
process, main.py --env); this is the TPU-native extension called out by the
rebuild's north star ("4096 vmapped multi-task envs", BASELINE.md): a single
device-resident batch where contiguous slices of the env axis imitate
different mocap clips, stepped inside one jitted program.

Design: task assignment is *static per slot* — slice k of the batch always
runs motion k. Shapes (EnvState, obs, action) are identical across motions
because the skeleton is shared, so each sub-env's pure functions are applied
to its slice and the results concatenated; XLA compiles one subgraph per
motion and the whole thing stays a fixed-shape jit/vmap program (no
per-env dynamic gather over padded motion tables needed). Auto-reset keeps a
slot on its task (reference-state initialization re-samples the phase only,
deepmimic.py:486-491 semantics per task).

A policy can be conditioned on the task through `task_obs=True`, which
appends a one-hot task id to the observation (the phase/pose features are
otherwise motion-relative and ambiguous across clips).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .deepmimic import DeepMimicEnv, EnvState, StepResult


class MultiTaskEnv:
    """Batched multi-motion env with the same API as DeepMimicEnv's
    batched surface (reset_batch / step_batch / step_autoreset)."""

    def __init__(self, motions: Sequence[str] = ("walk", "punch", "kick"),
                 task_obs: bool = False, **kwargs):
        if len(motions) < 1:
            raise ValueError("need at least one motion")
        self.motions = tuple(motions)
        self.envs = [DeepMimicEnv(motion=m, **kwargs) for m in motions]
        self.num_tasks = len(self.envs)
        self.task_obs = task_obs
        e0 = self.envs[0]
        self.base_observation_size = e0.observation_size
        self.observation_size = e0.observation_size + (
            self.num_tasks if task_obs else 0)
        self.action_size = e0.action_size
        self.action_low = e0.action_low
        self.action_high = e0.action_high
        for e in self.envs[1:]:
            assert e.observation_size == e0.observation_size
            assert e.action_size == e0.action_size

    # -- helpers ----------------------------------------------------------
    def _sizes(self, batch: int):
        """Per-task slice sizes: as even as possible, remainder to the
        first tasks (static Python ints — shapes stay fixed under jit)."""
        base, rem = divmod(batch, self.num_tasks)
        return [base + (1 if k < rem else 0) for k in range(self.num_tasks)]

    def _split(self, x, batch: int):
        """Split leading axis into num_tasks contiguous slices."""
        sizes = self._sizes(batch)
        offsets = np.cumsum([0] + sizes)
        return [jax.tree.map(lambda a: a[offsets[k]:offsets[k + 1]], x)
                for k in range(self.num_tasks)]

    @staticmethod
    def _concat(parts):
        return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *parts)

    def _with_task_obs(self, obs: jnp.ndarray) -> jnp.ndarray:
        if not self.task_obs:
            return obs
        onehot = jnp.asarray(
            np.eye(self.num_tasks, dtype=np.float32)[
                self.task_ids(obs.shape[0])], obs.dtype)
        return jnp.concatenate([obs, onehot], axis=-1)

    def task_ids(self, batch: int) -> np.ndarray:
        """Static per-slot task index (host-side helper for logging)."""
        return np.repeat(np.arange(self.num_tasks), self._sizes(batch))

    # -- batched API ------------------------------------------------------
    def reset_batch(self, keys: jax.Array) -> Tuple[EnvState, jnp.ndarray]:
        parts = [env.reset_batch(k)
                 for env, k in zip(self.envs, self._split(keys, keys.shape[0]))]
        states = self._concat([p[0] for p in parts])
        obs = self._concat([p[1] for p in parts])
        return states, self._with_task_obs(obs)

    def step_batch(self, states: EnvState, actions: jnp.ndarray) -> StepResult:
        batch = actions.shape[0]
        parts = [env.step_batch(s, a) for env, s, a in zip(
            self.envs, self._split(states, batch),
            self._split(actions, batch))]
        res = StepResult(*[self._concat([getattr(p, f) for p in parts])
                           for f in StepResult._fields])
        return res._replace(obs=self._with_task_obs(res.obs))

    def step_autoreset(self, states: EnvState, actions: jnp.ndarray,
                       keys: jax.Array):
        batch = actions.shape[0]
        parts = [env.step_autoreset(s, a, k) for env, s, a, k in zip(
            self.envs, self._split(states, batch),
            self._split(actions, batch), self._split(keys, batch))]
        new_states = self._concat([p[0] for p in parts])
        new_obs = self._with_task_obs(self._concat([p[1] for p in parts]))
        res = StepResult(*[self._concat([getattr(p[2], f) for p in parts])
                           for f in StepResult._fields])
        res = res._replace(obs=self._with_task_obs(res.obs))
        return new_states, new_obs, res


def make_multitask(motions: Sequence[str] = ("walk", "punch", "kick"),
                   **kwargs) -> MultiTaskEnv:
    return MultiTaskEnv(motions=motions, **kwargs)

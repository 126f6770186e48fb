"""Value-target normalizer with renormalization-preserving scale/offset.

Rebuild of the reference value denormalizer (actor_critic.py:246-269,
335-363): the critic regresses *normalized* targets; when the running
target statistics move, a scale/offset pair is updated so the network's
already-learned outputs keep denormalizing to the same values:

    value = (critic_out * scale + offset) * std + mean
    on update:  scale' = std / std_new ;  offset' = (mean - mean_new) / std_new

Disabled in all shipped DeepMimic presets (normalize_value=False,
settings/deepmimic/deepmimic_base.py:14) but part of the reference API
surface; wired into the actor-critic graph and the PPO/A2C value losses
behind ``ACConfig.normalize_value``.

Deviation (PARITY.md): the reference's renormalization OVERWRITES scale/
offset from the pre-update stats (actor_critic.py:354-356: scale=std/new_std)
— which only preserves outputs while scale/offset are still identity; after
the first update successive renormalizations drift. Here the update COMPOSES
(scale' = scale*std/new_std), which preserves denormalized outputs exactly
across every update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .normalizer import NormalizerState, update_moving_average


class ValueNormState(NamedTuple):
    mean: jnp.ndarray
    std: jnp.ndarray
    scale: jnp.ndarray
    offset: jnp.ndarray


def init() -> ValueNormState:
    return ValueNormState(
        mean=jnp.zeros(()), std=jnp.ones(()),
        scale=jnp.ones(()), offset=jnp.zeros(()),
    )


def denormalize(state: ValueNormState, raw_value, clip=None):
    v = raw_value * state.scale + state.offset
    if clip:
        v = jnp.clip(v, -clip, clip)
    return v * state.std + state.mean


def normalize_target(state: ValueNormState, target, clip=None):
    t = (target - state.mean) / state.std
    if clip:
        t = jnp.clip(t, -clip, clip)
    return t


def update(state: ValueNormState, targets, global_step) -> ValueNormState:
    prev = NormalizerState(mean=state.mean, std=state.std, count=jnp.asarray(0.0))
    new = update_moving_average(prev, targets[:, None] if targets.ndim == 1 else targets,
                                global_step)
    new_mean = new.mean.reshape(())
    new_std = new.std.reshape(())
    # preserve current denormalized outputs (actor_critic.py:353-356)
    offset = state.offset * (state.std / new_std) + (state.mean - new_mean) / new_std
    scale = state.scale * (state.std / new_std)
    return ValueNormState(mean=new_mean, std=new_std, scale=scale, offset=offset)

"""Uniform replay buffer as preallocated device arrays.

Rebuild of the reference's ring Buffer (models/workers/ddpg.py:11-27) with
fixed-shape device storage: O(1) insertion via dynamic scatter, uniform
sampling via random gather — everything inside jit.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
    data: Dict[str, jnp.ndarray]   # each (capacity, ...)
    pointer: jnp.ndarray           # ()
    size: jnp.ndarray              # ()

    @property
    def capacity(self) -> int:
        return next(iter(self.data.values())).shape[0]


def create(capacity: int, example: Dict[str, jnp.ndarray]) -> ReplayBuffer:
    data = {
        k: jnp.zeros((capacity,) + v.shape[1:], v.dtype)
        for k, v in example.items()
    }
    return ReplayBuffer(
        data=data, pointer=jnp.zeros((), jnp.int32), size=jnp.zeros((), jnp.int32)
    )


def add_batch(buf: ReplayBuffer, batch: Dict[str, jnp.ndarray]) -> ReplayBuffer:
    """Insert a batch of transitions (wraps around the ring)."""
    n = next(iter(batch.values())).shape[0]
    cap = buf.capacity
    idx = (buf.pointer + jnp.arange(n)) % cap
    data = {k: buf.data[k].at[idx].set(v) for k, v in batch.items()}
    return ReplayBuffer(
        data=data,
        pointer=(buf.pointer + n) % cap,
        size=jnp.minimum(buf.size + n, cap),
    )


def sample(buf: ReplayBuffer, key, batch_size: int) -> Dict[str, jnp.ndarray]:
    """Uniform sampling with replacement (reference flat_train off-policy
    path, distributed_model.py:345-351)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return {k: v[idx] for k, v in buf.data.items()}

"""Uniform replay buffer as one preallocated packed device array.

Rebuild of the reference's ring Buffer (models/workers/ddpg.py:11-27) with
fixed-shape device storage: O(1) insertion via dynamic scatter, uniform
sampling via random gather — everything inside jit.

The dict-of-fields API is preserved, but storage is ONE (capacity, D)
float32 array with a static field→column-slice spec. Packing helps the
device path twice: insert/sample are a single scatter/gather instead of
one per field, and under a mesh (ring replicated, transitions sharded —
distributed/mesh.py) the insert costs one all-gather of the packed rows
instead of five small per-field ones — fewer, larger collectives on ICI.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class ReplayBuffer:
    data: jnp.ndarray              # (capacity, D) packed float32
    pointer: jnp.ndarray           # ()
    size: jnp.ndarray              # ()
    # static field spec: name -> (col_offset, col_size, trailing_shape, dtype)
    spec: Tuple[Tuple[str, Tuple[int, int, Tuple[int, ...], str]], ...] = (
        struct.field(pytree_node=False, default=()))

    @property
    def capacity(self) -> int:
        return self.data.shape[0]


# dtypes that round-trip exactly through the float32 packed storage
_EXACT_VIA_F32 = frozenset(
    ("float32", "float16", "bfloat16", "bool",
     "int8", "int16", "uint8", "uint16"))


def _build_spec(example: Dict[str, jnp.ndarray]):
    spec = []
    off = 0
    for k in sorted(example):
        v = example[k]
        if str(v.dtype) not in _EXACT_VIA_F32:
            raise TypeError(
                f"replay field {k!r} has dtype {v.dtype}, which does not "
                "round-trip exactly through the packed float32 ring "
                f"(allowed: {sorted(_EXACT_VIA_F32)}); store a narrower "
                "type or extend the ring with a second integer plane")
        shape = tuple(int(s) for s in v.shape[1:])
        size = int(np.prod(shape)) if shape else 1
        spec.append((k, (off, size, shape, str(v.dtype))))
        off += size
    return tuple(spec), off


def _pack(spec, batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    n = next(iter(batch.values())).shape[0]
    cols = [batch[k].reshape(n, -1).astype(jnp.float32) for k, _ in spec]
    return jnp.concatenate(cols, axis=1)


def _unpack(spec, rows: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    n = rows.shape[0]
    out = {}
    for k, (off, size, shape, dtype) in spec:
        col = rows[:, off:off + size].reshape((n,) + shape)
        out[k] = col.astype(dtype)
    return out


def create(capacity: int, example: Dict[str, jnp.ndarray]) -> ReplayBuffer:
    spec, width = _build_spec(example)
    return ReplayBuffer(
        data=jnp.zeros((capacity, width), jnp.float32),
        pointer=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        spec=spec,
    )


def add_batch(buf: ReplayBuffer, batch: Dict[str, jnp.ndarray]) -> ReplayBuffer:
    """Insert a batch of transitions (wraps around the ring)."""
    packed = _pack(buf.spec, batch)
    n = packed.shape[0]
    cap = buf.capacity
    idx = (buf.pointer + jnp.arange(n)) % cap
    return ReplayBuffer(
        data=buf.data.at[idx].set(packed),
        pointer=(buf.pointer + n) % cap,
        size=jnp.minimum(buf.size + n, cap),
        spec=buf.spec,
    )


def contents(buf: ReplayBuffer) -> Dict[str, jnp.ndarray]:
    """The whole ring as per-field (capacity, ...) arrays (diagnostics)."""
    return _unpack(buf.spec, buf.data)


def sample(buf: ReplayBuffer, key, batch_size: int) -> Dict[str, jnp.ndarray]:
    """Uniform sampling with replacement (reference flat_train off-policy
    path, distributed_model.py:345-351)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(buf.size, 1))
    return _unpack(buf.spec, buf.data[idx])

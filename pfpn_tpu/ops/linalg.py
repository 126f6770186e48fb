"""Batched small-matrix linear algebra tuned for TPU.

XLA's batched Cholesky/LU on TPU lowers to long sequential loops of tiny
kernels (~4 ms for (1024, 34, 34) cho_factor on v5e — measured, see
tools/bench_sim.py methodology); the physics substep needs two SPD solves
per 600 Hz step, so they dominated the whole simulator. This module provides:

* :func:`spd_inverse` — explicit inverse of a symmetric positive-definite
  matrix. Unbatched it falls back to Cholesky; under ``vmap`` a
  ``custom_vmap`` rule dispatches the whole batch to a Pallas kernel that
  runs an in-place Gauss-Jordan sweep with the *batch in the lane
  dimension* — each of the N pivot steps is a handful of full-width VPU
  instructions, ~15x faster than the XLA factorization path.

Sweep correctness: for SPD matrices every pivot is a positive Schur
complement diagonal, so the pivot-free sweep is numerically equivalent to
an unpivoted Cholesky (stable for the well-conditioned mass matrices here;
a small diagonal regularizer is added by callers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

_LANES = 128


def _spd_inverse_kernel(a_ref, out_ref):
    """In-place Gauss-Jordan sweep; refs are (N, N, T) with batch in lanes.

    Ref writes with static indices replace functional .at[] updates (scatter
    is not lowerable in Pallas TPU).
    """
    n = a_ref.shape[0]
    out_ref[...] = a_ref[...]
    for k in range(n):
        inv_d = 1.0 / out_ref[k, k]                  # (T,)
        row_k = out_ref[k]                            # (N, T)
        col_k = out_ref[:, k]                         # (N, T)
        out_ref[...] = out_ref[...] - col_k[:, None, :] * (row_k[None, :, :] * inv_d)
        out_ref[k, :, :] = row_k * inv_d
        out_ref[:, k, :] = col_k * inv_d
        out_ref[k, k, :] = -inv_d
    out_ref[...] = -out_ref[...]


def _spd_inverse_pallas(a_bnn: jnp.ndarray) -> jnp.ndarray:
    """a: (B, N, N) -> (B, N, N) inverse via the sweep kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, n, _ = a_bnn.shape
    tile = _LANES if b >= _LANES else b
    pad = (-b) % tile
    if pad:
        # pad with identity blocks so the sweep stays non-singular
        eye = jnp.broadcast_to(jnp.eye(n, dtype=a_bnn.dtype), (pad, n, n))
        a_bnn = jnp.concatenate([a_bnn, eye], axis=0)
    bp = a_bnn.shape[0]

    a_nnb = jnp.transpose(a_bnn, (1, 2, 0))   # batch -> lanes
    out = pl.pallas_call(
        _spd_inverse_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n, bp), a_bnn.dtype),
        grid=(bp // tile,),
        in_specs=[pl.BlockSpec((n, n, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
    )(a_nnb)
    out = jnp.transpose(out, (2, 0, 1))
    return out[:b] if pad else out


def _spd_inverse_reference(a: jnp.ndarray) -> jnp.ndarray:
    ch = cho_factor(a)
    return cho_solve(ch, jnp.eye(a.shape[-1], dtype=a.dtype))


@jax.custom_batching.custom_vmap
def spd_inverse(a: jnp.ndarray) -> jnp.ndarray:
    """Inverse of an SPD matrix (N, N); batch via vmap to hit the TPU
    Pallas path."""
    return _spd_inverse_reference(a)


@spd_inverse.def_vmap
def _spd_inverse_vmap(axis_size, in_batched, a):
    (a_batched,) = in_batched
    if not a_batched:
        a = jnp.broadcast_to(a, (axis_size,) + a.shape)
    if jax.default_backend() == "tpu":
        out = _spd_inverse_pallas(a)
    else:
        out = jax.vmap(_spd_inverse_reference)(a)
    return out, True


@jax.custom_batching.custom_vmap
def spd_inverse_pair(pair: jnp.ndarray) -> jnp.ndarray:
    """Invert a stacked pair (2, N, N) of SPD matrices in one kernel launch
    (the physics substep needs both H^-1 and (H + diag(kd dt))^-1)."""
    return jax.vmap(_spd_inverse_reference)(pair)


@spd_inverse_pair.def_vmap
def _spd_inverse_pair_vmap(axis_size, in_batched, pair):
    (batched,) = in_batched
    if not batched:
        pair = jnp.broadcast_to(pair, (axis_size,) + pair.shape)
    b, two, n, _ = pair.shape
    flat = pair.reshape(b * two, n, n)
    if jax.default_backend() == "tpu":
        # NOTE: no Newton-Schulz refine — measured on v5e the fp32 VPU sweep
        # reaches ~3e-7 relative error while a refine step through the MXU's
        # default-precision matmuls DEGRADES it to ~4e-3 (and costs ~360 us
        # at B=1024).
        out = _spd_inverse_pallas(flat)
    else:
        out = jax.vmap(_spd_inverse_reference)(flat)
    return out.reshape(b, two, n, n), True

"""Plain functional MLP with the reference's initialization scheme.

The reference uses truncated-normal(0, 0.01) weights, zero biases and relu6
activations for the DeepMimic trunks (settings/deepmimic/deepmimic_base.py:3-8,
networks/ops.py:82-118). Parameters are plain dict pytrees — full control is
needed because PFPN resampling performs surgery on the policy logit layer.
"""

from __future__ import annotations

from typing import Callable, List, Sequence

import jax
import jax.numpy as jnp


def truncated_normal_init(key, shape, stddev: float = 0.01):
    """tf.truncated_normal_initializer semantics: resample beyond 2 sigma."""
    return stddev * jax.random.truncated_normal(key, -2.0, 2.0, shape)


def glorot_uniform_init(key, shape, stddev=None):
    fan_in, fan_out = shape[0], shape[1]
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-limit, maxval=limit)


def init_linear(key, in_dim: int, out_dim: int, w_init=truncated_normal_init):
    return {
        "w": w_init(key, (in_dim, out_dim)),
        "b": jnp.zeros(out_dim),
    }


def apply_linear(params, x):
    return x @ params["w"] + params["b"]


def init_mlp(key, sizes: Sequence[int], w_init=truncated_normal_init):
    """sizes = [in, h1, h2, ..., out]; returns list of layer dicts."""
    keys = jax.random.split(key, len(sizes) - 1)
    return [
        init_linear(k, sizes[i], sizes[i + 1], w_init)
        for i, k in enumerate(keys)
    ]


def apply_mlp(params: List[dict], x, activation=jax.nn.relu6,
              last_activation=None):
    for i, layer in enumerate(params):
        x = apply_linear(layer, x)
        act = last_activation if i + 1 == len(params) else activation
        if act is not None:
            x = act(x)
    return x

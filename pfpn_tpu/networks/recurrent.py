"""Recurrent (LSTM) and convolutional building blocks.

Functional equivalents of the reference primitives (networks/ops.py:11-80):
``lstm_layer`` with explicit carried (c, h) state + dynamic_rnn semantics,
and NHWC conv layers. None of the shipped DeepMimic settings use them, but
they are part of the reference network toolbox (episodic/sequence training
with carried LSTM state, distributed_model.py:354-370) and compose with the
trunks in networks/actor_critic.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .mlp import truncated_normal_init


class LSTMState(NamedTuple):
    c: jnp.ndarray
    h: jnp.ndarray


def init_lstm(key, in_dim: int, hidden: int, w_init=truncated_normal_init):
    k1, k2 = jax.random.split(key)
    return {
        "wi": w_init(k1, (in_dim, 4 * hidden)),
        "wh": w_init(k2, (hidden, 4 * hidden)),
        "b": jnp.zeros(4 * hidden),
    }


def lstm_zero_state(hidden: int, batch: Tuple[int, ...] = ()) -> LSTMState:
    shape = tuple(batch) + (hidden,)
    return LSTMState(c=jnp.zeros(shape), h=jnp.zeros(shape))


def lstm_cell(params, state: LSTMState, x) -> Tuple[LSTMState, jnp.ndarray]:
    gates = x @ params["wi"] + state.h @ params["wh"] + params["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f + 1.0) * state.c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return LSTMState(c=c, h=h), h


def lstm_sequence(params, state: LSTMState, xs, seq_mask=None):
    """Scan a [T, ...] sequence; optionally reset state where mask == 0
    (zero-padded episodic batches, reference vtrace.py:67-85)."""

    def step(carry, inp):
        if seq_mask is None:
            x = inp
            m = None
        else:
            x, m = inp
        new, h = lstm_cell(params, carry, x)
        if m is not None:
            keep = m[..., None]
            new = LSTMState(c=new.c * keep, h=new.h * keep)
            h = h * keep
        return new, h

    inputs = xs if seq_mask is None else (xs, seq_mask)
    state, hs = jax.lax.scan(step, state, inputs)
    return state, hs


def init_conv(key, in_ch: int, out_ch: int, ksize: int, w_init=truncated_normal_init):
    return {
        "w": w_init(key, (ksize, ksize, in_ch, out_ch)),
        "b": jnp.zeros(out_ch),
    }


def apply_conv(params, x, stride: int = 1, padding: str = "SAME",
               activation=jax.nn.relu6):
    """NHWC convolution (reference ops.py:40-80)."""
    y = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b"]
    return activation(y) if activation is not None else y

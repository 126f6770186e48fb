"""Particle-filtering policy distribution (the PFPN head).

Per action dimension d: a categorical over N particles (weights from a
network logit layer) mixed with per-particle Gaussians whose means/stds are
*free trainable variables*. Functional rebuild of the reference
``MixtureGaussianDistribution`` (networks/utils.py:85-236):

* ``log_prob`` — mixture density per dimension, summed over dimensions,
  with tanh-squash Jacobian correction when the head squashes
  (utils.py:108-144). We evaluate in log space (logsumexp) which is strictly
  more stable than the reference's sum-then-log; a cotangent sanitizer
  reproduces the reference's NaN/Inf-gradient suppression
  (utils.py:109-117).
* ``sample`` — the PPO/A2C path: plain categorical + Gaussian draw
  (utils.py:187-194), no reparameterization.
* ``rsample_squashed`` — the SAC path: Gumbel-softmax relaxed particle
  choice with straight-through custom gradients that route cotangents to
  *all* particle samples proportionally to (p - selected)
  (utils.py:153-186, the ``mask``/``mask2`` custom gradients).
* ``mode`` — deterministic action: argmax-weight particle's mean
  (utils.py:202-236), with the same gap-routing gradient in the squashed
  case.

Shapes: logits [..., D, N]; loc/scale [D, N]; actions [..., D].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .gaussian import LOG2, atanh_safe

_LOG_2PI = jnp.log(2.0 * jnp.pi)


# ---------------------------------------------------------------------------
# log-prob
# ---------------------------------------------------------------------------

@jax.custom_vjp
def _sanitize_grad(x):
    return x


def _sanitize_fwd(x):
    return x, None


def _sanitize_bwd(_, g):
    # zero non-finite cotangents: particle movement can push the target's
    # density to 0 (log-prob -> -inf); the reference zeroes these gradients
    # (utils.py:109-117)
    return (jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)),)


_sanitize_grad.defvjp(_sanitize_fwd, _sanitize_bwd)


def component_log_pdf(loc, scale, pre_value):
    """[..., D] value against [D, N] particles -> [..., D, N]."""
    z = (pre_value[..., None] - loc) / scale
    return -0.5 * (z * z + _LOG_2PI) - jnp.log(scale)


def log_prob(logits, loc, scale, value, squash: bool = False, pre_tanh=None):
    """Summed log-prob [...]. For squashed heads pass either the squashed
    action (atanh applied internally) or the pre-tanh value directly."""
    if squash:
        pre = atanh_safe(value) if pre_tanh is None else pre_tanh
    else:
        pre = value
    lw = jax.nn.log_softmax(logits, axis=-1)
    lp = jax.nn.logsumexp(lw + component_log_pdf(loc, scale, pre), axis=-1)
    lp = _sanitize_grad(lp)
    if squash:
        lp = lp - 2.0 * (LOG2 - pre - jax.nn.softplus(-2.0 * pre))
    return jnp.sum(lp, axis=-1)


def entropy(logits):
    """Per-dimension particle-weight entropy [..., D] (utils.py:146-151)."""
    v = logits - jnp.max(logits, axis=-1, keepdims=True)
    s0 = jnp.exp(v)
    s1 = jnp.sum(s0, axis=-1, keepdims=True)
    p = s0 / s1
    return jnp.sum(p * (jnp.log(s1) - v), axis=-1)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def sample(key, logits, loc, scale):
    """Non-reparameterized draw (PPO/A2C path, utils.py:187-194).

    Returns (action [..., D], particle_index [..., D])."""
    k1, k2 = jax.random.split(key)
    idx = jax.random.categorical(k1, logits, axis=-1)
    mu = jnp.take_along_axis(
        jnp.broadcast_to(loc, logits.shape), idx[..., None], axis=-1
    )[..., 0]
    sd = jnp.take_along_axis(
        jnp.broadcast_to(scale, logits.shape), idx[..., None], axis=-1
    )[..., 0]
    eps = jax.random.normal(k2, idx.shape)
    return mu + sd * eps, idx


# -- straight-through custom gradients (utils.py:160-186) -------------------

@jax.custom_vjp
def _st_pick(w, p, m):
    """Forward: sum_n m*p. Backward: d/dw = (p - picked), d/dp = m."""
    return jnp.sum(m * p, axis=-1)


def _st_pick_fwd(w, p, m):
    y = jnp.sum(m * p, axis=-1)
    return y, (p, m, y)


def _st_pick_bwd(res, g):
    p, m, y = res
    gap = p - y[..., None]
    ge = g[..., None]
    return (gap * ge, m * ge, None)


_st_pick.defvjp(_st_pick_fwd, _st_pick_bwd)


@jax.custom_vjp
def _st_pick_pre(w, p, m, tanh_p):
    """Forward: sum_n m*p (pre-tanh). Backward routes the w-cotangent through
    the squashed gap: d/dw = (tanh_p - tanh_picked) / (1 - tanh_picked^2)
    (reference ``mask2``, utils.py:164-171)."""
    return jnp.sum(m * p, axis=-1)


def _st_pick_pre_fwd(w, p, m, tanh_p):
    y = jnp.sum(m * p, axis=-1)
    tanh_t = jnp.sum(m * tanh_p, axis=-1)
    return y, (m, tanh_p, tanh_t)


def _st_pick_pre_bwd(res, g):
    m, tanh_p, tanh_t = res
    gap = (tanh_p - tanh_t[..., None]) / jnp.maximum(1e-6, 1.0 - tanh_t[..., None] ** 2)
    ge = g[..., None]
    return (gap * ge, m * ge, None, None)


_st_pick_pre.defvjp(_st_pick_pre_fwd, _st_pick_pre_bwd)


def rsample_squashed(key, logits, loc, scale, temperature: float = 1.0):
    """Reparameterized squashed draw (SAC path, utils.py:156-186).

    Returns (action in (-1,1) [..., D], pre_tanh value [..., D]). Gradients
    flow to the logits via the relaxed one-hot sample and to all particle
    means/stds via the straight-through masks.
    """
    k1, k2 = jax.random.split(key)
    g = jax.random.gumbel(k1, logits.shape)
    w = jax.nn.softmax((logits + g) / temperature, axis=-1)
    idx = jnp.argmax(w, axis=-1)
    m = jax.nn.one_hot(idx, logits.shape[-1], dtype=w.dtype)
    # straight-through: forward uses the hard one-hot, backward the relaxed w
    m_st = m + (w - jax.lax.stop_gradient(w))

    p = loc + scale * jax.random.normal(k2, logits.shape)
    tanh_p = jnp.tanh(p)
    pre = _st_pick_pre(m_st, p, m, tanh_p)
    action = _st_pick(m_st, tanh_p, m)
    return action, pre


def mode(logits, loc, scale=None, squash: bool = False):
    """Deterministic action (utils.py:202-236)."""
    if not squash:
        idx = jnp.argmax(logits, axis=-1)
        return jnp.take_along_axis(
            jnp.broadcast_to(loc, logits.shape), idx[..., None], axis=-1
        )[..., 0]
    w = jax.nn.softmax(logits, axis=-1)
    idx = jnp.argmax(w, axis=-1)
    m = jax.nn.one_hot(idx, logits.shape[-1], dtype=w.dtype)
    p = jnp.broadcast_to(jnp.tanh(loc), logits.shape)
    return _st_pick(w, p, m)


def probs(logits):
    return jax.nn.softmax(logits, axis=-1)

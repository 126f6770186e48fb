"""PFPN particle resampling as a pure parameter transform.

Rebuild of the reference's in-graph resampling ops (a2c.py:367-474) as a
function ``(head_params, activation_stats, key) -> (head_params', stats')``
executed under ``lax.cond`` on the optimizer-step counter. All index work is
dense [D, N] masking/gather — no dynamic shapes, TPU-friendly.

Semantics (reference line cites):
* a particle is dead when its max activation over the interval is below
  threshold (default .05/N, a2c.py:391);
* replacement candidates are drawn per-dimension proportionally to average
  activation (``resample=-1`` path, a2c.py:400-403) or uniformly from the
  top-k most active (a2c.py:405-408);
* the dead slot receives the candidate's mean/log-std and the candidate's
  logit column (weights); the candidate's logit bias is reduced by
  log(count+1-delta) and shared with its copies so total weight mass is
  preserved (a2c.py:420-471);
* the copied mean is jittered by +-std uniform noise with a 1e-4 minimum
  magnitude (a2c.py:441-445).

Deviation (documented): for the non-fixed-sigma squashed (SAC) head the
reference applies ``atanh(clip(.))`` to a value that already lives in atanh
space (a2c.py:448-450) — a bug we do not reproduce; noise is added in the
particle's native (atanh) space.

Adam moments of resampled entries are intentionally left stale, matching the
reference (SURVEY.md §7 hard-part 4; the TF optimizer slots are never
touched by the scatter updates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .heads import ParticleHead


def resample(cfg: ParticleHead, params: dict, stats: dict, key) -> dict:
    d, n = cfg.action_dim, cfg.particles
    thr = cfg.resample_threshold if cfg.resample_threshold else 0.05 / n

    max_active = stats["max_active"]          # [D, N]
    sum_active = stats["sum_active"]
    invalid = max_active < thr                # [D, N]

    total = jnp.sum(sum_active, axis=1, keepdims=True)
    avg = jnp.where(total > 0, sum_active / jnp.maximum(total, 1e-12), 1.0 / n)

    k1, k2 = jax.random.split(key)
    if cfg.resample < 0:
        # candidate per slot ~ Categorical(avg activation) (a2c.py:400-403)
        tgt = jax.random.categorical(k1, jnp.log(jnp.maximum(avg, 1e-12)),
                                     axis=-1, shape=(n, d)).T  # [D, N]
    else:
        kk = min(n, cfg.resample)
        _, top = jax.lax.top_k(avg, kk)                       # [D, kk]
        choice = jax.random.randint(k1, (d, n), 0, kk)
        tgt = jnp.take_along_axis(top, choice, axis=1)        # [D, N]

    slots = jnp.broadcast_to(jnp.arange(n), (d, n))
    tgt = jnp.where(invalid, tgt, slots)

    # ---- logits bias mass splitting (a2c.py:453-466) ----
    b = params["fc_policy"]["b"].reshape(d, n)
    inv_f = invalid.astype(b.dtype)
    count = jax.vmap(
        lambda t_row, i_row: jnp.zeros(n, b.dtype).at[t_row].add(i_row)
    )(tgt, inv_f)                                             # [D, N]
    new_bias = b - jnp.log(count + 1.0 - inv_f)
    b1 = jnp.where(count > 0, new_bias, b)
    b2 = jnp.where(invalid, jnp.take_along_axis(new_bias, tgt, axis=1), b1)

    # ---- logits weight column copy (a2c.py:467-469) ----
    w = params["fc_policy"]["w"]
    feat = w.shape[0]
    w_r = w.reshape(feat, d, n)
    w_t = jnp.take_along_axis(w_r, tgt[None, :, :], axis=2)
    w_new = jnp.where(invalid[None, :, :], w_t, w_r).reshape(feat, d * n)

    # ---- particle mean/std copy + jitter (a2c.py:420-451) ----
    loc = params["particles"]
    tgt_loc = jnp.take_along_axis(loc, tgt, axis=1)
    if cfg.fixed_sigma:
        logstd_key = "particles_log_std_fixed"
        tgt_logstd = jnp.take_along_axis(params[logstd_key], tgt, axis=1)
        noise_scale = jnp.exp(tgt_logstd)
        if cfg.squash:
            # jitter in tanh space, then back to atanh space (a2c.py:430-450)
            t_loc = jnp.tanh(tgt_loc)
            noise = noise_scale * jax.random.uniform(k2, (d, n), minval=-1.0, maxval=1.0)
            noise = noise + jnp.where(noise < 0, -1e-4, 1e-4)
            t_loc = t_loc + noise
            new_loc = jnp.arctanh(jnp.clip(t_loc, 1e-6 - 1.0, 1.0 - 1e-6))
        else:
            noise = noise_scale * jax.random.uniform(k2, (d, n), minval=-1.0, maxval=1.0)
            noise = noise + jnp.where(noise < 0, -1e-4, 1e-4)
            new_loc = tgt_loc + noise
        new_params = {
            **params,
            "fc_policy": {"w": w_new, "b": b2.reshape(d * n)},
            "particles": jnp.where(invalid, new_loc, loc),
        }
    else:
        logstd = params["particles_log_std"]
        tgt_logstd = jnp.clip(jnp.take_along_axis(logstd, tgt, axis=1), -20.0, 2.0)
        noise = jnp.exp(tgt_logstd) * jax.random.uniform(
            k2, (d, n), minval=-1.0, maxval=1.0
        )
        noise = noise + jnp.where(noise < 0, -1e-4, 1e-4)
        new_loc = tgt_loc + noise
        new_params = {
            **params,
            "fc_policy": {"w": w_new, "b": b2.reshape(d * n)},
            "particles": jnp.where(invalid, new_loc, loc),
            "particles_log_std": jnp.where(invalid, tgt_logstd, logstd),
        }
    return new_params


def maybe_resample(cfg: ParticleHead, params: dict, stats: dict, key):
    """Per-optimizer-step hook: increment the counter; at the interval,
    resample and clear the accumulators (a2c.py:367-383).

    Returns (head_params, stats). No-op (identity) when cfg.resample is 0.
    """
    if not cfg.resample:
        return params, stats
    flag = stats["train_flag"] + 1.0

    def do_resample(args):
        p, s, k = args
        p2 = resample(cfg, p, s, k)
        s2 = {
            "max_active": jnp.zeros_like(s["max_active"]),
            "sum_active": jnp.zeros_like(s["sum_active"]),
            "train_flag": jnp.zeros(()),
        }
        return p2, s2

    def no_op(args):
        p, s, _ = args
        return p, {**s, "train_flag": flag}

    return jax.lax.cond(
        flag >= cfg.resample_interval, do_resample, no_op,
        (params, {**stats, "train_flag": flag}, key),
    )

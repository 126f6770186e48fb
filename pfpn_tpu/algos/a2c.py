"""A2C / A3C (advantage actor-critic) on the fused PPO pipeline.

The reference's A3C is HogWild-asynchronous data parallelism
(models/async_model.py) — lock-free gradient application has no idiomatic
TPU analog (SURVEY.md §5 "Distributed communication backend"), so the
algorithm is provided with synchronous-DP execution semantics: same losses
(plain policy-gradient with materialized value target, a2c.py:51-65 +
workers/a2c.py:74-77), same 16-worker x unroll-32 data flow, deterministic
instead of racy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ppo import PPO, PPOConfig

A2CConfig = PPOConfig


class A2C(PPO):
    """Same rollout/update machinery as PPO with A2C losses."""

    def _loss(self, params, norm, batch, vnorm=None):
        net = self.net
        ncfg = net.cfg
        lp = net.log_prob(params, norm, batch["obs"], batch["action"])
        adv = batch["advantage"]
        if ncfg.normalize_advantage:
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
        if ncfg.clip_advantage:
            adv = jnp.clip(adv, -ncfg.clip_advantage, ncfg.clip_advantage)
        adv = jax.lax.stop_gradient(adv)
        policy_loss = -jnp.mean(lp * adv)

        # value_target = value + advantage, materialized like the reference
        # host-side buffer (workers/a2c.py:74-77)
        v_target = batch["value"] + batch["advantage"]
        if ncfg.normalize_value:
            from ..networks import value_norm as vnorm_mod
            v = net.normalized_value(params, norm, batch["obs"], vnorm)
            v_target = vnorm_mod.normalize_target(vnorm, v_target,
                                                  clip=ncfg.clip_value)
        else:
            v = net.value(params, norm, batch["obs"])
        value_loss = jnp.mean((v - v_target) ** 2)

        entropy = None
        if ncfg.entropy_beta:
            entropy = jnp.mean(net.entropy(params, norm, batch["obs"]))
            policy_loss = policy_loss - ncfg.entropy_beta * entropy

        loss = policy_loss + ncfg.value_loss_coef * value_loss
        return loss, {
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy if entropy is not None else jnp.zeros(()),
        }

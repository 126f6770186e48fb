"""IMPALA / V-trace on the fused rollout (learner-model rebuild).

The reference decouples 32 actor processes from 1 learner via a gRPC
PaddingFIFOQueue of zero-padded episodes (models/learner_model.py:69-165);
on TPU the actor farm is the vmapped env batch and the queue disappears —
rollout and update fuse into one jitted program (SURVEY.md §2.3). The
learner's "dequeue batches of 4 episodes" becomes sequential gradient steps
over groups of `queue_batch` env streams per round.

V-trace math matches networks/actor_critic/vtrace.py:101-180:
  rho_t = min(rho_clip, exp(target_lp - behavior_lp))
  c_t   = min(1, rho)
  delta_t = rho_t (r_t + gamma*nt_t*V_{t+1} - V_t)
  (vs - V)_t = delta_t + gamma*nt_t*(1-done_t)*c_t*(vs - V)_{t+1}
  pg_adv_t = pg_rho_t (r_t + gamma*nt_t*vs_next - V_t)
with nt = not-true-terminal (truncation bootstraps, vtrace worker
interact_with_env) and the recurrence cut at episode ends
(vtrace.py:139-142). Per-step pre-reset bootstrap values replace the
reference's zero-padding machinery — the episodes never need padding when
boundaries are handled per step.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..networks import normalizer as norm_mod
from ..networks.heads import ParticleHead
from ..networks.resample import maybe_resample
from .ppo import PPO, PPOConfig, PPOState


@dataclasses.dataclass(frozen=True)
class VTraceConfig:
    num_envs: int = 32                # reference: 32 IMPALA actors
    unroll_length: int = 64
    queue_batch: int = 4              # learner dequeue size
    rho_clip: float = 1.0
    pg_rho_clip: float = 1.0
    lr_actor: float = 1e-4
    lr_critic: float = 1e-4
    norm_clip: Optional[float] = 0.5


class VTrace(PPO):
    def __init__(self, env, net, cfg: VTraceConfig):
        ppo_cfg = PPOConfig(
            num_envs=cfg.num_envs, unroll_length=cfg.unroll_length,
            minibatch_size=cfg.queue_batch * cfg.unroll_length, opt_epochs=1,
            lr_actor=cfg.lr_actor, lr_critic=cfg.lr_critic,
            norm_clip=cfg.norm_clip,
        )
        super().__init__(env, net, ppo_cfg)
        self.vcfg = cfg

    def _vtrace_loss(self, params, norm, batch):
        """batch: time-major [T, G, ...] group of env streams."""
        net = self.net
        ncfg = net.cfg
        t, g = batch["reward"].shape

        obs = batch["obs"].reshape((t * g,) + batch["obs"].shape[2:])
        act = batch["action"].reshape((t * g,) + batch["action"].shape[2:])
        target_lp = net.log_prob(params, norm, obs, act).reshape(t, g)
        values = net.value(params, norm, obs).reshape(t, g)

        rho = jnp.exp(target_lp - batch["log_prob"])
        v_rho = jnp.minimum(self.vcfg.rho_clip, rho)
        c = jnp.minimum(1.0, rho)

        nt = 1.0 - batch["terminated"].astype(values.dtype)
        nd = 1.0 - batch["done"].astype(values.dtype)
        gamma = ncfg.gamma
        v_next = batch["next_value"]  # pre-reset bootstrap (stop-grad by storage)
        delta = v_rho * (batch["reward"] + gamma * nt * v_next - values)

        def body(carry, x):
            d, coef = x
            carry = d + coef * carry
            return carry, carry

        coef = gamma * nt * nd * c
        _, vs_minus_v = jax.lax.scan(
            body, jnp.zeros(g), (delta, coef), reverse=True
        )
        vs = jax.lax.stop_gradient(vs_minus_v + values)

        # pg advantage: vs_{t+1} within episode, bootstrap at boundary
        vs_next = jnp.concatenate([vs[1:], v_next[-1:]], axis=0)
        vs_next = jnp.where(batch["done"], v_next, vs_next)
        pg_rho = jnp.minimum(self.vcfg.pg_rho_clip, rho)
        pg_adv = jax.lax.stop_gradient(
            pg_rho * (batch["reward"] + gamma * nt * vs_next - values)
        )

        policy_loss = -jnp.mean(target_lp * pg_adv)
        value_loss = jnp.mean((values - vs) ** 2)
        entropy = None
        if ncfg.entropy_beta:
            entropy = jnp.mean(net.entropy(params, norm, obs))
            policy_loss = policy_loss - ncfg.entropy_beta * entropy
        loss = policy_loss + ncfg.value_loss_coef * value_loss
        return loss, {
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy if entropy is not None else jnp.zeros(()),
        }

    def update(self, state: PPOState, traj):
        net, cfg = self.net, self.cfg
        ncfg = net.cfg
        g = self.vcfg.queue_batch
        n_groups = cfg.num_envs // g

        # split env streams into learner "queue batches" [T, G, ...]
        grouped = jax.tree.map(
            lambda x: x.reshape((x.shape[0], n_groups, g) + x.shape[2:])
            .swapaxes(0, 1),
            traj,
        )
        rs_keys = jax.random.split(state.key, n_groups + 1)
        key, rs_keys = rs_keys[0], rs_keys[1:]

        def step(carry, xs):
            params, opt_state, norm, stats, gstep = carry
            batch, rs_key = xs
            (loss, metrics), grads = jax.value_and_grad(
                self._vtrace_loss, has_aux=True
            )(params, norm, batch)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            gstep = gstep + 1
            if ncfg.normalize_state:
                flat_obs = batch["obs"].reshape((-1,) + batch["obs"].shape[2:])
                norm = norm_mod.update_moving_average(norm, flat_obs, gstep)
            if self._is_pfpn and ncfg.head.resample:
                head_p, stats = maybe_resample(ncfg.head, params["head"], stats, rs_key)
                params = {**params, "head": head_p}
            metrics["loss"] = loss
            return (params, opt_state, norm, stats, gstep), metrics

        carry = (state.params, state.opt_state, state.norm, state.head_stats,
                 state.global_step)
        carry, metrics = jax.lax.scan(step, carry, (grouped, rs_keys))
        params, opt_state, norm, stats, gstep = carry
        state = state.replace(
            params=params, opt_state=opt_state, norm=norm, head_stats=stats,
            key=key, global_step=gstep,
        )
        return state, jax.tree.map(jnp.mean, metrics)

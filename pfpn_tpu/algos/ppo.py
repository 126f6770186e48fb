"""Clip-PPO (DPPO) fused rollout + update, all inside jit.

Rebuild of the reference's synchronous DPPO pipeline — SyncModel worker farm
+ SyncReplicasOptimizer gradient aggregation + host-side GAE
(models/sync_model.py, models/workers/ppo.py, networks/actor_critic/ppo.py) —
inverted for TPU (SURVEY.md §7): the env physics, reward, normalizer, GAE,
losses and the optimizer update run in one jitted program, vmapped over
envs. N reference workers map to N parallel envs; the reference's 8-way
gradient aggregation at minibatch 32 is the same computation as one
minibatch of 256 here (SyncReplicasOptimizer averages member gradients).

Parity semantics:
* rollout stores the *unclipped* sampled action and its at-sample log-prob;
  the env receives the action clipped to its bounds
  (distributed_model.py:264-290);
* GAE bootstraps 0 on true terminals and V(next pre-reset state) on
  truncation / unroll boundaries (ppo.py:56-66);
* advantages normalized per minibatch when configured
  (actor_critic.py:151-156); the value target is old_value + raw advantage
  (ppo.py:31-34);
* observation-normalizer updates use the first epoch's minibatches only
  (sync_model.py:103-149) with the (1+s)/(10+s) decay schedule;
* PFPN activation accumulators update on every sampling forward pass
  (a2c.py:356-365); resampling runs on the optimizer-step counter
  (a2c.py:367-383).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..networks import normalizer as norm_mod
from ..networks import value_norm as vnorm_mod
from ..networks.actor_critic import ActorCritic
from ..networks.heads import ParticleHead, update_activation_stats
from ..networks.resample import maybe_resample
from .gae import gae


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_envs: int = 8                  # reference: 8 DPPO workers
    unroll_length: int = 512
    minibatch_size: int = 256          # = reference batch 32 x 8 workers
    opt_epochs: int = 1
    epsilon: float = 0.2
    lr_actor: float = 1e-4
    lr_critic: float = 1e-4
    norm_clip: Optional[float] = 1.0


@struct.dataclass
class PPOState:
    params: Any
    opt_state: Any
    norm: norm_mod.NormalizerState
    head_stats: Dict
    env_state: Any
    obs: jnp.ndarray
    key: jax.Array
    global_step: jnp.ndarray      # optimizer steps
    total_samples: jnp.ndarray
    # episode bookkeeping for metrics
    ep_return: jnp.ndarray        # (B,) running return per env
    last_ep_return: jnp.ndarray   # (B,) most recent completed episode
    # value-target normalizer (actor_critic.py:246-269; identity unless
    # net.cfg.normalize_value). Optional[ValueNormState]; the default stays
    # None so no array is created at import time (premature backend init).
    vnorm: Any = None
    # carried LSTM (c, h) per env — used by RecurrentPPO only
    # (algos/recurrent.py; reference episodic mode distributed_model.py:354-370)
    carry: Any = None


def _label_params(params):
    return {
        k: ("critic" if k == "critic" else "actor") for k in params.keys()
    }


def make_optimizer(cfg: PPOConfig):
    if cfg.lr_actor == cfg.lr_critic:
        tx = [optax.clip_by_global_norm(cfg.norm_clip)] if cfg.norm_clip else []
        return optax.chain(*tx, optax.adam(cfg.lr_actor))

    def group(lr):
        tx = [optax.clip_by_global_norm(cfg.norm_clip)] if cfg.norm_clip else []
        return optax.chain(*tx, optax.adam(lr))

    return optax.multi_transform(
        {"actor": group(cfg.lr_actor), "critic": group(cfg.lr_critic)},
        _label_params,
    )


class PPO:
    """Binds (env, ActorCritic, PPOConfig) into jitted train functions."""

    def __init__(self, env, net: ActorCritic, cfg: PPOConfig):
        self.env = env
        self.net = net
        self.cfg = cfg
        self.tx = make_optimizer(cfg)
        self._is_pfpn = isinstance(net.cfg.head, ParticleHead)

    # -- init ------------------------------------------------------------
    def init_state(self, key) -> PPOState:
        k_param, k_env, k_state = jax.random.split(key, 3)
        params = self.net.init(k_param)
        env_keys = jax.random.split(k_env, self.cfg.num_envs)
        env_state, obs = self.env.reset_batch(env_keys)
        return PPOState(
            params=params,
            opt_state=self.tx.init(params),
            norm=self.net.init_norm(),
            head_stats=self.net.init_stats(),
            env_state=env_state,
            obs=obs,
            key=k_state,
            global_step=jnp.zeros((), jnp.int32),
            total_samples=jnp.zeros((), jnp.int64 if jax.config.x64_enabled else jnp.int32),
            ep_return=jnp.zeros(self.cfg.num_envs),
            last_ep_return=jnp.zeros(self.cfg.num_envs),
            vnorm=vnorm_mod.init(),
        )

    # -- rollout ---------------------------------------------------------
    def _clip_action(self, a):
        low = getattr(self.env, "action_low", None)
        if low is None:
            return a
        return jnp.clip(a, jnp.asarray(self.env.action_low),
                        jnp.asarray(self.env.action_high))

    def rollout(self, state: PPOState):
        net, env, cfg = self.net, self.env, self.cfg

        def step(carry, _):
            env_state, obs, key, stats, ep_ret, last_ret = carry
            key, k_act, k_reset = jax.random.split(key, 3)
            a, lp, v, aux = net.act(state.params, state.norm, k_act, obs,
                                    state.vnorm)
            if self._is_pfpn:
                stats = update_activation_stats(stats, aux["probs"])
            reset_keys = jax.random.split(k_reset, cfg.num_envs)
            new_env_state, next_obs, res = env.step_autoreset(
                env_state, self._clip_action(a), reset_keys
            )
            v_next = net.value(state.params, state.norm, res.obs, state.vnorm)
            ep_ret = ep_ret + res.reward
            last_ret = jnp.where(res.done, ep_ret, last_ret)
            ep_ret = jnp.where(res.done, 0.0, ep_ret)
            data = dict(
                obs=obs, action=a, log_prob=lp, value=v, reward=res.reward,
                next_value=v_next,
                terminated=res.terminated, done=res.done,
            )
            return (new_env_state, next_obs, key, stats, ep_ret, last_ret), data

        carry = (state.env_state, state.obs, state.key, state.head_stats,
                 state.ep_return, state.last_ep_return)
        carry, traj = jax.lax.scan(step, carry, None, length=cfg.unroll_length)
        env_state, obs, key, stats, ep_ret, last_ret = carry
        state = state.replace(
            env_state=env_state, obs=obs, key=key, head_stats=stats,
            ep_return=ep_ret, last_ep_return=last_ret,
            total_samples=state.total_samples
            + cfg.unroll_length * cfg.num_envs,
        )
        return state, traj

    # -- losses ----------------------------------------------------------
    def _loss(self, params, norm, batch, vnorm=None):
        net, cfg = self.net, self.cfg
        ncfg = net.cfg
        lp = net.log_prob(params, norm, batch["obs"], batch["action"])
        ratio = jnp.exp(lp - batch["log_prob"])
        adv = batch["advantage"]
        if ncfg.normalize_advantage:
            adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
        if ncfg.clip_advantage:
            adv = jnp.clip(adv, -ncfg.clip_advantage, ncfg.clip_advantage)
        adv = jax.lax.stop_gradient(adv)
        surr = ratio * adv
        clipped = jnp.clip(ratio, 1.0 - cfg.epsilon, 1.0 + cfg.epsilon) * adv
        policy_loss = -jnp.mean(jnp.minimum(surr, clipped))

        v_target = batch["value"] + batch["advantage"]  # ppo.py:31-34
        if ncfg.normalize_value:
            # regress scale/offset-adjusted critic output against the
            # normalized target (actor_critic.py:117-135)
            v = net.normalized_value(params, norm, batch["obs"], vnorm)
            v_target = vnorm_mod.normalize_target(vnorm, v_target,
                                                  clip=ncfg.clip_value)
        else:
            v = net.value(params, norm, batch["obs"])
        value_loss = jnp.mean((v - jax.lax.stop_gradient(v_target)) ** 2)

        entropy = None
        if ncfg.entropy_beta:
            entropy = jnp.mean(net.entropy(params, norm, batch["obs"]))
            policy_loss = policy_loss - ncfg.entropy_beta * entropy

        loss = policy_loss + ncfg.value_loss_coef * value_loss
        metrics = {
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy if entropy is not None else jnp.zeros(()),
        }
        return loss, metrics

    # -- update ----------------------------------------------------------
    def update(self, state: PPOState, traj):
        net, cfg = self.net, self.cfg
        ncfg = net.cfg

        adv = gae(
            traj["reward"], traj["value"], traj["next_value"],
            traj["terminated"], traj["done"], ncfg.gamma, ncfg.lambd,
        )
        flat = {
            k: traj[k].reshape((-1,) + traj[k].shape[2:])
            for k in ("obs", "action", "log_prob", "value")
        }
        flat["advantage"] = adv.reshape(-1)

        n = flat["advantage"].shape[0]
        mb = cfg.minibatch_size
        n_mb = n // mb

        def epoch(carry, epoch_idx):
            params, opt_state, norm, stats, vnorm, key, gstep = carry
            key, k_perm, k_rs = jax.random.split(key, 3)
            perm = jax.random.permutation(k_perm, n)
            shuf = {k: v[perm] for k, v in flat.items()}
            batched = {
                k: v[: n_mb * mb].reshape((n_mb, mb) + v.shape[1:])
                for k, v in shuf.items()
            }
            rs_keys = jax.random.split(k_rs, n_mb)

            def minibatch(carry, xs):
                params, opt_state, norm, stats, vnorm, gstep = carry
                batch, rs_key = xs
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss, has_aux=True
                )(params, norm, batch, vnorm)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                gstep = gstep + 1
                if ncfg.normalize_value:
                    # running stats from the raw target, scale/offset
                    # renormalized to preserve denormalized outputs
                    # (actor_critic.py:347-363; UPDATE_OPS cadence = every
                    # optimizer step)
                    vnorm = vnorm_mod.update(
                        vnorm, batch["value"] + batch["advantage"], gstep
                    )
                # normalizer: first epoch only (sync_model.py:103-149)
                if ncfg.normalize_state:
                    new_norm = norm_mod.update_moving_average(
                        norm, batch["obs"], gstep
                    )
                    norm = jax.tree.map(
                        lambda a, b: jnp.where(epoch_idx == 0, a, b),
                        new_norm, norm,
                    )
                if self._is_pfpn and ncfg.head.resample:
                    head_p, stats = maybe_resample(
                        ncfg.head, params["head"], stats, rs_key
                    )
                    params = {**params, "head": head_p}
                metrics["loss"] = loss
                return (params, opt_state, norm, stats, vnorm, gstep), metrics

            (params, opt_state, norm, stats, vnorm, gstep), metrics = jax.lax.scan(
                minibatch, (params, opt_state, norm, stats, vnorm, gstep),
                (batched, rs_keys),
            )
            return (params, opt_state, norm, stats, vnorm, key, gstep), metrics

        carry = (state.params, state.opt_state, state.norm, state.head_stats,
                 state.vnorm, state.key, state.global_step)
        carry, metrics = jax.lax.scan(
            epoch, carry, jnp.arange(cfg.opt_epochs)
        )
        params, opt_state, norm, stats, vnorm, key, gstep = carry
        state = state.replace(
            params=params, opt_state=opt_state, norm=norm, head_stats=stats,
            vnorm=vnorm, key=key, global_step=gstep,
        )
        metrics = jax.tree.map(lambda x: jnp.mean(x), metrics)
        return state, metrics

    # -- one full round (jit this) ---------------------------------------
    def train_round(self, state: PPOState):
        state, traj = self.rollout(state)
        state, metrics = self.update(state, traj)
        metrics["episode_reward"] = jnp.mean(state.last_ep_return)
        metrics["total_samples"] = state.total_samples
        metrics["global_step"] = state.global_step
        return state, metrics

    # -- deterministic evaluation (performance_test parity) ---------------
    def evaluate(self, params, norm, key, num_episodes: int = 10,
                 max_steps: int = 600):
        env = self.env
        keys = jax.random.split(key, num_episodes)
        env_state, obs = env.reset_batch(keys)

        def step(carry, _):
            env_state, obs, ret, frames, done = carry
            a = self.net.act_deterministic(params, norm, obs)
            res = env.step_batch(env_state, self._clip_action(a))
            ret = ret + jnp.where(done, 0.0, res.reward)
            frames = frames + jnp.where(done, 0, 1)
            done = jnp.logical_or(done, res.done)
            return (res.state, res.obs, ret, frames, done), None

        init = (env_state, obs, jnp.zeros(num_episodes),
                jnp.zeros(num_episodes, jnp.int32),
                jnp.zeros(num_episodes, dtype=bool))
        carry, _ = jax.lax.scan(step, init, None, length=max_steps)
        _, _, ret, frames, done = carry
        return {"reward": ret, "frames": frames, "finished": done}

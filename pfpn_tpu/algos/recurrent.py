"""Recurrent (episodic/sequence) PPO — the reference's LSTM training mode.

Rebuild of episodic training (models/distributed_model.py:168-190, 354-370):
the reference collects whole episodes, zero-pads them into [B, T] batches
with sequence_length masking, and carries LSTM (c, h) across train calls via
`reset_training_state`. Here the capability is expressed TPU-natively:

* the carry is algorithm state, threaded through the rollout `lax.scan` and
  zeroed where an episode ends (no padding — boundaries are per-step masks);
* the update recomputes activations time-major over the whole unroll from
  the *stored* unroll-initial carry (exact, not the reference's
  zeros-when-batch>1 approximation), resetting at recorded boundaries;
* minibatches are groups of env streams (sequences), matching the
  reference's "batch of episodes" semantics (vtrace.py:67-85).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..networks import normalizer as norm_mod
from ..networks.heads import ParticleHead, update_activation_stats
from ..networks.recurrent import LSTMState
from ..networks.recurrent_ac import RecurrentActorCritic
from ..networks.resample import maybe_resample
from .gae import gae
from .ppo import PPO, PPOConfig, PPOState


class RecurrentPPO(PPO):
    """Clip-PPO over a RecurrentActorCritic with carried LSTM state.

    sequence_batch = env streams per minibatch (defaults to
    minibatch_size // unroll_length, at least 1)."""

    def __init__(self, env, net: RecurrentActorCritic, cfg: PPOConfig,
                 sequence_batch: Optional[int] = None):
        assert isinstance(net, RecurrentActorCritic)
        assert not net.cfg.normalize_value, \
            "normalize_value not supported on the recurrent path"
        super().__init__(env, net, cfg)
        self.seq_batch = sequence_batch or max(
            1, cfg.minibatch_size // cfg.unroll_length)

    # -- init ------------------------------------------------------------
    def init_state(self, key) -> PPOState:
        state = super().init_state(key)
        return state.replace(carry=self.net.zero_carry(self.cfg.num_envs))

    # -- rollout ---------------------------------------------------------
    def rollout(self, state: PPOState):
        net, env, cfg = self.net, self.env, self.cfg
        carry0 = state.carry

        def step(scarry, _):
            env_state, obs, key, stats, ep_ret, last_ret, carry = scarry
            key, k_act, k_reset = jax.random.split(key, 3)
            a, lp, v, aux, new_carry = net.act(
                state.params, state.norm, k_act, obs, carry)
            if self._is_pfpn:
                stats = update_activation_stats(stats, aux["probs"])
            reset_keys = jax.random.split(k_reset, cfg.num_envs)
            new_env_state, next_obs, res = env.step_autoreset(
                env_state, self._clip_action(a), reset_keys)
            # bootstrap value of the PRE-reset next obs, with the post-step
            # carry (the state that would consume s_{t+1})
            v_next, _ = net.value_step(state.params, state.norm, res.obs,
                                       new_carry)
            # episode boundary -> next step starts from the zero state
            keep = (~res.done).astype(new_carry.h.dtype)[:, None]
            new_carry = LSTMState(c=new_carry.c * keep, h=new_carry.h * keep)
            ep_ret = ep_ret + res.reward
            last_ret = jnp.where(res.done, ep_ret, last_ret)
            ep_ret = jnp.where(res.done, 0.0, ep_ret)
            data = dict(
                obs=obs, action=a, log_prob=lp, value=v, reward=res.reward,
                next_value=v_next,
                terminated=res.terminated, done=res.done,
            )
            return (new_env_state, next_obs, key, stats, ep_ret, last_ret,
                    new_carry), data

        scarry = (state.env_state, state.obs, state.key, state.head_stats,
                  state.ep_return, state.last_ep_return, state.carry)
        scarry, traj = jax.lax.scan(step, scarry, None,
                                    length=cfg.unroll_length)
        env_state, obs, key, stats, ep_ret, last_ret, carry = scarry
        state = state.replace(
            env_state=env_state, obs=obs, key=key, head_stats=stats,
            ep_return=ep_ret, last_ep_return=last_ret, carry=carry,
            total_samples=state.total_samples
            + cfg.unroll_length * cfg.num_envs,
        )
        traj["carry0"] = carry0  # [B, hidden] — unroll-initial state
        return state, traj

    # -- sequence loss -----------------------------------------------------
    def _loss_seq(self, params, norm, batch, carry0):
        net, cfg = self.net, self.cfg
        ncfg = net.cfg
        lp, v, ent = net.sequence_outputs(
            params, norm, batch["obs"], batch["action"], carry0,
            batch["reset_before"], want_entropy=bool(ncfg.entropy_beta))
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

        v_target = batch["value"] + batch["advantage"]
        value_loss = jnp.mean((v - v_target) ** 2)

        entropy = jnp.zeros(())
        if ncfg.entropy_beta:
            entropy = jnp.mean(ent)
            policy_loss = policy_loss - ncfg.entropy_beta * entropy

        loss = policy_loss + ncfg.value_loss_coef * value_loss
        return loss, {
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy,
        }

    # -- update ------------------------------------------------------------
    def update(self, state: PPOState, traj):
        net, cfg = self.net, self.cfg
        ncfg = net.cfg
        carry0 = traj.pop("carry0")

        adv = gae(
            traj["reward"], traj["value"], traj["next_value"],
            traj["terminated"], traj["done"], ncfg.gamma, ncfg.lambd,
        )
        done = traj["done"]
        reset_before = jnp.concatenate(
            [jnp.zeros_like(done[:1]), done[:-1]], axis=0)

        t, b = done.shape
        g = self.seq_batch
        n_mb = max(1, b // g)
        g = b // n_mb

        seq = {k: traj[k] for k in ("obs", "action", "log_prob", "value")}
        seq["advantage"] = adv
        seq["reset_before"] = reset_before

        def epoch(ecarry, epoch_idx):
            params, opt_state, norm, stats, key, gstep = ecarry
            key, k_perm, k_rs = jax.random.split(key, 3)
            perm = jax.random.permutation(k_perm, b)[: n_mb * g]

            def gather(x):  # [T, B, ...] -> [n_mb, T, g, ...]
                xs = x[:, perm]
                return xs.reshape((t, n_mb, g) + x.shape[2:]).swapaxes(0, 1)

            batched = {k: gather(v) for k, v in seq.items()}
            c0 = jax.tree.map(
                lambda x: x[perm].reshape((n_mb, g) + x.shape[1:]), carry0)
            rs_keys = jax.random.split(k_rs, n_mb)

            def minibatch(mcarry, xs):
                params, opt_state, norm, stats, gstep = mcarry
                batch, c0_g, rs_key = xs
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss_seq, has_aux=True
                )(params, norm, batch, c0_g)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                gstep = gstep + 1
                if ncfg.normalize_state:
                    flat_obs = batch["obs"].reshape(
                        (-1,) + batch["obs"].shape[2:])
                    new_norm = norm_mod.update_moving_average(
                        norm, flat_obs, gstep)
                    norm = jax.tree.map(
                        lambda a, b_: jnp.where(epoch_idx == 0, a, b_),
                        new_norm, norm)
                if self._is_pfpn and ncfg.head.resample:
                    head_p, stats = maybe_resample(
                        ncfg.head, params["head"], stats, rs_key)
                    params = {**params, "head": head_p}
                metrics["loss"] = loss
                return (params, opt_state, norm, stats, gstep), metrics

            (params, opt_state, norm, stats, gstep), metrics = jax.lax.scan(
                minibatch, (params, opt_state, norm, stats, gstep),
                (batched, c0, rs_keys))
            return (params, opt_state, norm, stats, key, gstep), metrics

        ecarry = (state.params, state.opt_state, state.norm,
                  state.head_stats, state.key, state.global_step)
        ecarry, metrics = jax.lax.scan(
            epoch, ecarry, jnp.arange(cfg.opt_epochs))
        params, opt_state, norm, stats, key, gstep = ecarry
        state = state.replace(
            params=params, opt_state=opt_state, norm=norm, head_stats=stats,
            key=key, global_step=gstep,
        )
        return state, jax.tree.map(jnp.mean, metrics)

    # -- evaluation with carried state --------------------------------------
    def evaluate(self, params, norm, key, num_episodes: int = 10,
                 max_steps: int = 600):
        env = self.env
        keys = jax.random.split(key, num_episodes)
        env_state, obs = env.reset_batch(keys)
        carry = self.net.zero_carry(num_episodes)

        def step(scarry, _):
            env_state, obs, ret, frames, done, carry = scarry
            a, carry = self.net.act_deterministic(params, norm, obs, carry)
            res = env.step_batch(env_state, self._clip_action(a))
            ret = ret + jnp.where(done, 0.0, res.reward)
            frames = frames + jnp.where(done, 0, 1)
            done = jnp.logical_or(done, res.done)
            return (res.state, res.obs, ret, frames, done, carry), None

        init = (env_state, obs, jnp.zeros(num_episodes),
                jnp.zeros(num_episodes, jnp.int32),
                jnp.zeros(num_episodes, dtype=bool), carry)
        scarry, _ = jax.lax.scan(step, init, None, length=max_steps)
        _, _, ret, frames, done, _ = scarry
        return {"reward": ret, "frames": frames, "finished": done}

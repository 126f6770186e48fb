"""SAC and DDPG/TD3 with device-resident replay, fused env+update rounds.

Rebuild of the reference off-policy stack (networks/actor_critic/sac.py,
ddpg.py + models/workers/ddpg.py, sac.py): twin Q critics on
[normalized state ‖ action], Polyak-averaged target critics (tau=0.005),
squashed policies with bound denormalization. SAC learns the temperature
alpha with target entropy -|A| folded into the policy loss (sac.py:166-173);
DDPG/TD3 uses a deterministic actor + Gaussian exploration noise, a target
actor with smoothing noise, and delayed policy updates (ddpg.py:13-23).

Execution parity: the reference runs 1 env step then 1 gradient step at
batch 256 (deepmimic_sac_base.py + flat_train's off-policy branch,
distributed_model.py:345-351). Here each jitted round performs
`steps_per_round` of those (env step -> buffer insert -> uniform sample ->
update), vmapped over num_envs parallel envs (num_envs=1 is exact parity).
With num_envs=N > 1, `updates_per_step` should be N so every round does N
sequential batch-256 gradient steps after inserting N transitions — the
reference's 1-gradient-step-per-env-sample ratio is preserved exactly; only
the interleaving changes (N samples arrive per round instead of 1). This is
the TPU-native acceleration of the single-env reference loop: batch-1
physics is tunnel-latency-bound (~140 samples/s), batch-N amortizes it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..networks import normalizer as norm_mod
from ..networks.actor_critic import ActorCritic
from ..networks.heads import (
    GaussianHead, ParticleHead, deterministic_action, sample_with_log_prob,
    update_activation_stats,
)
from ..networks.mlp import apply_mlp, init_mlp
from ..networks.resample import maybe_resample
from . import replay


@dataclasses.dataclass(frozen=True)
class SACConfig:
    algo: str = "sac"                 # "sac" | "ddpg"
    num_envs: int = 1
    batch_size: int = 256
    buffer_capacity: int = 1_000_000
    warmup: int = 0                   # random-action observation steps
    steps_per_round: int = 64         # env+grad steps fused per jit call
    updates_per_step: int = 1         # grad steps per env round (set to
                                      # num_envs to keep 1 grad step/sample)
    gamma: float = 0.95
    tau: float = 0.005
    lr_actor: float = 1e-4
    lr_critic: float = 1e-4
    lr_alpha: float = 1e-4
    norm_clip: Optional[float] = 1.0
    # DDPG/TD3 options (ddpg.py:13-23)
    twin_q: bool = True
    policy_delay: int = 2
    act_noise: float = 0.1
    target_noise: float = 0.2
    # Ornstein-Uhlenbeck exploration (original DDPG; reference defaults it
    # off in favor of Gaussian, ddpg.py:19): per-env mean-reverting state
    # n <- (1 - theta*dt)*n + sigma*sqrt(dt)*N(0,1)  (ddpg.py:134-143)
    ou_noise: bool = False
    ou_sigma: float = 0.3
    ou_theta: float = 0.15
    ou_dt: float = 0.01


@struct.dataclass
class SACState:
    params: Any              # {actor..., q1, q2, log_alpha}
    target: Any              # {q1, q2[, actor...]}
    opt_state: Any
    norm: norm_mod.NormalizerState
    head_stats: Dict
    buffer: replay.ReplayBuffer
    env_state: Any
    obs: jnp.ndarray
    key: jax.Array
    global_step: jnp.ndarray
    total_samples: jnp.ndarray
    ep_return: jnp.ndarray
    last_ep_return: jnp.ndarray
    # per-env OU exploration noise (zeros and unused unless cfg.ou_noise)
    ou_state: jnp.ndarray = None


class SAC:
    def __init__(self, env, net: ActorCritic, cfg: SACConfig):
        self.env = env
        self.net = net
        self.cfg = cfg
        self._is_pfpn = isinstance(net.cfg.head, ParticleHead)
        self.tx = self._make_optimizer()

    # -- params ------------------------------------------------------------
    def _make_optimizer(self):
        cfg = self.cfg

        def group(lr):
            tx = [optax.clip_by_global_norm(cfg.norm_clip)] if cfg.norm_clip else []
            return optax.chain(*tx, optax.adam(lr))

        def labeler(params):
            out = {}
            for k in params:
                if k in ("q1", "q2"):
                    out[k] = "critic"
                elif k == "log_alpha":
                    out[k] = "alpha"
                else:
                    out[k] = "actor"
            return out

        return optax.multi_transform(
            {"actor": group(cfg.lr_actor), "critic": group(cfg.lr_critic),
             "alpha": group(cfg.lr_alpha)},
            labeler,
        )

    def _init_q(self, key, obs_dim, act_dim):
        sizes = [obs_dim + act_dim, *self.net.cfg.critic_shape, 1]
        return init_mlp(key, sizes)

    def init_state(self, key) -> SACState:
        cfg = self.cfg
        k_a, k_q1, k_q2, k_env, k_s = jax.random.split(key, 5)
        ac_params = self.net.init(k_a)
        params = {k: v for k, v in ac_params.items() if k != "critic"}
        obs_dim = self.net.cfg.obs_dim
        act_dim = self.net.cfg.head.action_dim
        params["q1"] = self._init_q(k_q1, obs_dim, act_dim)
        params["q2"] = self._init_q(k_q2, obs_dim, act_dim)
        if cfg.algo == "sac":
            params["log_alpha"] = jnp.zeros(())

        # target nets: critics always; DDPG also targets the actor.
        # jnp.copy matters: target leaves must be DISTINCT buffers from the
        # online params — donate_argnums on the jitted train_round otherwise
        # donates the same buffer twice, which multi-device Execute rejects
        # (and the partition that rejects it leaves the other partitions
        # hanging in their first collective).
        target = {"q1": jax.tree.map(jnp.copy, params["q1"]),
                  "q2": jax.tree.map(jnp.copy, params["q2"])}
        if cfg.algo == "ddpg":
            target["actor"] = {
                k: jax.tree.map(jnp.copy, params[k]) for k in params
                if k not in ("q1", "q2", "log_alpha")
            }

        env_keys = jax.random.split(k_env, cfg.num_envs)
        env_state, obs = self.env.reset_batch(env_keys)
        example = {
            "obs": obs, "action": jnp.zeros((cfg.num_envs, act_dim)),
            "reward": jnp.zeros(cfg.num_envs),
            "not_terminal": jnp.ones(cfg.num_envs),
            "next_obs": obs,
        }
        return SACState(
            params=params, target=target, opt_state=self.tx.init(params),
            norm=self.net.init_norm(), head_stats=self.net.init_stats(),
            buffer=replay.create(cfg.buffer_capacity, example),
            env_state=env_state, obs=obs, key=k_s,
            global_step=jnp.zeros((), jnp.int32),
            total_samples=jnp.zeros((), jnp.int32),
            ep_return=jnp.zeros(cfg.num_envs),
            last_ep_return=jnp.zeros(cfg.num_envs),
            ou_state=jnp.zeros((cfg.num_envs, act_dim)),
        )

    # -- forward helpers ----------------------------------------------------
    def _q_value(self, q_params, norm, obs, action):
        # Q on [normalized state ‖ action] (reference sac.py:107-121; the
        # DeepMimic common net is empty so the critic input is the state)
        x = self.net._normalized(norm, obs)
        inp = jnp.concatenate([x, action], axis=-1)
        return apply_mlp(q_params, inp)[..., 0]

    def _actor_sample(self, params, norm, key, obs):
        feat = self.net.actor_features(params, norm, obs)
        return sample_with_log_prob(self.net.cfg.head, params["head"], feat, key)

    def _actor_mode(self, params, norm, obs):
        feat = self.net.actor_features(params, norm, obs)
        return deterministic_action(self.net.cfg.head, params["head"], feat)

    def _explore_action(self, params, norm, key, obs, ou):
        """Behavior action during rollout. Returns (action, aux, new_ou)."""
        cfg = self.cfg
        if cfg.algo == "sac":
            a, _, aux = self._actor_sample(params, norm, key, obs)
            return a, aux, ou
        # DDPG: deterministic + exploration noise (ddpg.py:130-158)
        a = self._actor_mode(params, norm, obs)
        if cfg.ou_noise:
            # Ornstein-Uhlenbeck (ddpg.py:134-143): persistent mean-
            # reverting noise state, one process per env
            ou = ((1.0 - cfg.ou_theta * cfg.ou_dt) * ou
                  + cfg.ou_sigma * np.sqrt(cfg.ou_dt)
                  * jax.random.normal(key, a.shape))
            return a + ou, {}, ou
        a = a + cfg.act_noise * jax.random.normal(key, a.shape)
        return a, {}, ou

    def _clip_action(self, a):
        low = getattr(self.env, "action_low", None)
        if low is None:
            return a
        return jnp.clip(a, jnp.asarray(self.env.action_low),
                        jnp.asarray(self.env.action_high))

    # -- losses --------------------------------------------------------------
    def _critic_loss(self, params, target, norm, batch, key):
        cfg = self.cfg
        if cfg.algo == "sac":
            a2, lp2, _ = self._actor_sample(params, norm, key, batch["next_obs"])
            q1t = self._q_value(target["q1"], norm, batch["next_obs"], a2)
            q2t = self._q_value(target["q2"], norm, batch["next_obs"], a2)
            alpha = jax.lax.stop_gradient(jnp.exp(params["log_alpha"]))
            v_next = jnp.minimum(q1t, q2t) - alpha * lp2
        else:
            actor_t = {**target["actor"]}
            a2 = self._actor_mode(actor_t, norm, batch["next_obs"])
            if cfg.target_noise:
                a2 = a2 + cfg.target_noise * jax.random.normal(key, a2.shape)
                a2 = self._clip_action(a2)
            q1t = self._q_value(target["q1"], norm, batch["next_obs"], a2)
            v_next = q1t
            if cfg.twin_q:
                q2t = self._q_value(target["q2"], norm, batch["next_obs"], a2)
                v_next = jnp.minimum(q1t, q2t)
        q_target = jax.lax.stop_gradient(
            batch["reward"] + cfg.gamma * batch["not_terminal"] * v_next
        )
        q1 = self._q_value(params["q1"], norm, batch["obs"], batch["action"])
        q2 = self._q_value(params["q2"], norm, batch["obs"], batch["action"])
        return jnp.mean((q_target - q1) ** 2 + (q_target - q2) ** 2), q_target

    def _actor_loss(self, params, norm, batch, key, gstep):
        cfg = self.cfg
        if cfg.algo == "sac":
            a, lp, aux = self._actor_sample(params, norm, key, batch["obs"])
            q1 = self._q_value(jax.lax.stop_gradient(params["q1"]), norm, batch["obs"], a)
            q2 = self._q_value(jax.lax.stop_gradient(params["q2"]), norm, batch["obs"], a)
            alpha = jax.lax.stop_gradient(jnp.exp(params["log_alpha"]))
            loss = jnp.mean(alpha * lp - jnp.minimum(q1, q2))
            # temperature auto-tuning folded in (sac.py:166-173)
            target_entropy = -float(self.net.cfg.head.action_dim)
            loss = loss - jnp.mean(
                params["log_alpha"] * jax.lax.stop_gradient(lp + target_entropy)
            )
            return loss, aux
        # DDPG: -Q(s, pi(s)), gated by policy delay (ddpg.py:192-199)
        a = self._actor_mode(params, norm, batch["obs"])
        q = self._q_value(jax.lax.stop_gradient(params["q1"]), norm, batch["obs"], a)
        loss = -jnp.mean(q)
        if cfg.policy_delay > 1:
            gate = (gstep % cfg.policy_delay == 0).astype(loss.dtype)
            loss = loss * gate
        return loss, {}

    def _update_step(self, params, target, opt_state, norm, stats, batch, key, gstep):
        cfg = self.cfg
        k_c, k_a, k_rs = jax.random.split(key, 3)

        def total_loss(p):
            closs, _ = self._critic_loss(p, target, norm, batch, k_c)
            aloss, aux = self._actor_loss(p, norm, batch, k_a, gstep)
            return closs + aloss, (closs, aloss, aux)

        (loss, (closs, aloss, aux)), grads = jax.value_and_grad(
            total_loss, has_aux=True
        )(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        gstep = gstep + 1

        # Polyak target sync (sac.py:67-73 / ddpg.py:92-106)
        def polyak(t, o):
            return jax.tree.map(lambda a, b: (1 - cfg.tau) * a + cfg.tau * b, t, o)

        new_target = {"q1": polyak(target["q1"], params["q1"]),
                      "q2": polyak(target["q2"], params["q2"])}
        if cfg.algo == "ddpg":
            online_actor = {k: params[k] for k in target["actor"]}
            if cfg.policy_delay > 1:
                gate = (gstep % cfg.policy_delay == 0)
                new_actor = jax.tree.map(
                    lambda t, o: jnp.where(gate, (1 - cfg.tau) * t + cfg.tau * o, t),
                    target["actor"], online_actor,
                )
            else:
                new_actor = polyak(target["actor"], online_actor)
            new_target["actor"] = new_actor

        if self.net.cfg.normalize_state:
            norm = norm_mod.update_moving_average(norm, batch["obs"], gstep)
        if self._is_pfpn and self.net.cfg.head.resample:
            head_p, stats = maybe_resample(self.net.cfg.head, params["head"], stats, k_rs)
            params = {**params, "head": head_p}

        metrics = {"loss": loss, "critic_loss": closs, "actor_loss": aloss}
        if cfg.algo == "sac":
            metrics["alpha"] = jnp.exp(params["log_alpha"])
        return params, new_target, opt_state, norm, stats, gstep, metrics

    # -- fused round ----------------------------------------------------------
    def train_round(self, state: SACState):
        cfg = self.cfg

        def step(carry, _):
            state = carry
            key, k_act, k_reset, _k_samp, k_upd = jax.random.split(state.key, 5)
            a, aux, ou = self._explore_action(
                state.params, state.norm, k_act, state.obs, state.ou_state)
            if self._is_pfpn and "probs" in aux:
                stats = update_activation_stats(state.head_stats, aux["probs"])
            else:
                stats = state.head_stats
            a_env = self._clip_action(a)
            reset_keys = jax.random.split(k_reset, cfg.num_envs)
            new_env_state, next_obs, res = self.env.step_autoreset(
                state.env_state, a_env, reset_keys
            )
            # not_terminal: 0 only on true terminal (workers/ddpg.py:45-56)
            nt = 1.0 - res.terminated.astype(jnp.float32)
            buf = replay.add_batch(state.buffer, {
                "obs": state.obs, "action": a_env, "reward": res.reward,
                "not_terminal": nt, "next_obs": res.obs,
            })
            ep_ret = state.ep_return + res.reward
            last_ret = jnp.where(res.done, ep_ret, state.last_ep_return)
            ep_ret = jnp.where(res.done, 0.0, ep_ret)

            can_train = buf.size >= cfg.batch_size + cfg.warmup

            # `updates_per_step` sequential batch-256 gradient steps against
            # the round's buffer snapshot — num_envs of them keeps the
            # reference's 1-grad-step-per-sample ratio (flat_train off-policy
            # branch, distributed_model.py:345-351) under batched rollout.
            # Gating is select-based (compute, then `where(can_train, ...)`)
            # rather than `lax.cond`: under GSPMD the sharded-env→replicated-
            # ring insert means the sampled batch arrives via an all-gather,
            # and a collective sunk into a cond branch deadlocks the CPU
            # collective runtime (rendezvous waits for all partitions; only
            # the taken branch's thread arrives). can_train is False only
            # while the ring holds < batch_size samples, so the discarded
            # wasted update costs nothing in steady state.
            def inner(icarry, ik):
                params, target, opt_state, norm, stats_c, gstep = icarry
                k_samp, k_up = jax.random.split(ik)
                batch = replay.sample(buf, k_samp, cfg.batch_size)

                new = self._update_step(
                    params, target, opt_state, norm, stats_c, batch,
                    k_up, gstep,
                )
                old = (params, target, opt_state, norm, stats_c, gstep,
                       {"loss": jnp.zeros(()), "critic_loss": jnp.zeros(()),
                        "actor_loss": jnp.zeros(()),
                        **({"alpha": jnp.exp(params["log_alpha"])}
                           if cfg.algo == "sac" else {})})
                out = jax.tree.map(
                    lambda a, b: jnp.where(can_train, a, b), new, old)
                return out[:6], out[6]

            (params, target, opt_state, norm, stats2, gstep), im = jax.lax.scan(
                inner,
                (state.params, state.target, state.opt_state, state.norm,
                 stats, state.global_step),
                jax.random.split(k_upd, cfg.updates_per_step),
            )
            metrics = jax.tree.map(jnp.mean, im)
            new_state = state.replace(
                params=params, target=target, opt_state=opt_state, norm=norm,
                head_stats=stats2, buffer=buf, env_state=new_env_state,
                obs=next_obs, key=key, global_step=gstep,
                total_samples=state.total_samples + cfg.num_envs,
                ep_return=ep_ret, last_ep_return=last_ret, ou_state=ou,
            )
            return new_state, metrics

        state, metrics = jax.lax.scan(step, state, None, length=cfg.steps_per_round)
        metrics = jax.tree.map(jnp.mean, metrics)
        metrics["episode_reward"] = jnp.mean(state.last_ep_return)
        metrics["total_samples"] = state.total_samples
        metrics["global_step"] = state.global_step
        return state, metrics

    # -- evaluation -----------------------------------------------------------
    def evaluate(self, params, norm, key, num_episodes: int = 10, max_steps: int = 600):
        env = self.env
        keys = jax.random.split(key, num_episodes)
        env_state, obs = env.reset_batch(keys)

        def step(carry, _):
            env_state, obs, ret, frames, done = carry
            a = self._actor_mode(params, norm, obs)
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

"""Actor-critic network assembly (functional).

Rebuild of the reference graph template (networks/actor_critic/
actor_critic.py:74-184): state normalizer (stop-gradient, clipped) ->
optional shared trunk -> actor MLP + policy head; critic MLP -> value.
DeepMimic settings: empty common net, 1024-512 trunks, relu6,
truncated-normal(0, 0.01) init (settings/deepmimic/deepmimic_base.py:3-8).

Parameters are split into:
* ``params``  — trainable pytree {"actor": {...}, "critic": [...]}
* ``norm``    — observation normalizer state (non-trainable, updated at
  train time; actor_critic.py:320-333)
* ``stats``   — PFPN activation accumulators (non-trainable, updated on
  every sampling forward pass; a2c.py:346-365)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from . import heads as heads_mod
from . import normalizer as norm_mod
from .heads import CategoricalHead, GaussianHead, ParticleHead
from .mlp import apply_mlp, init_mlp, truncated_normal_init


@jax.custom_vjp
def _clip_with_gradient(x, lo, hi):
    """Straight-through clip: hard clip forward, identity gradient backward
    (reference networks/ops.py:4-9 clip_by_value_with_gradient) — a critic
    output outside the clip band keeps a nonzero value-loss gradient and can
    recover."""
    return jnp.clip(x, lo, hi)


def _clip_fwd(x, lo, hi):
    return jnp.clip(x, lo, hi), None


def _clip_bwd(_, g):
    return (g, None, None)


_clip_with_gradient.defvjp(_clip_fwd, _clip_bwd)


@dataclasses.dataclass(frozen=True)
class ACConfig:
    obs_dim: int
    head: Union[GaussianHead, CategoricalHead, ParticleHead]
    common_shape: Tuple[int, ...] = ()
    actor_shape: Tuple[int, ...] = (1024, 512)
    critic_shape: Tuple[int, ...] = (1024, 512)
    normalize_state: bool = True
    clip_state: Optional[float] = 5.0
    # value-target normalization (actor_critic.py:246-269,335-363; disabled
    # in every shipped DeepMimic preset, deepmimic_base.py:14)
    normalize_value: bool = False
    clip_value: Optional[float] = None
    # loss coefficients (actor_critic.py:101-184)
    value_loss_coef: float = 0.5
    entropy_beta: Optional[float] = None
    normalize_advantage: bool = False
    clip_advantage: Optional[float] = None
    # returns
    gamma: float = 0.95
    lambd: float = 0.95


class ActorCritic:
    """Binds an ACConfig into pure init/apply functions."""

    def __init__(self, cfg: ACConfig):
        self.cfg = cfg

    # -- init ------------------------------------------------------------
    def init(self, key) -> dict:
        cfg = self.cfg
        k_common, k_actor, k_head, k_critic = jax.random.split(key, 4)
        params = {}
        feat = cfg.obs_dim
        if cfg.common_shape:
            params["common"] = init_mlp(k_common, [feat, *cfg.common_shape])
            feat = cfg.common_shape[-1]
        actor_feat = feat
        if cfg.actor_shape:
            params["actor_trunk"] = init_mlp(k_actor, [feat, *cfg.actor_shape])
            actor_feat = cfg.actor_shape[-1]
        params["head"] = heads_mod.init_head(k_head, cfg.head, actor_feat)
        params["critic"] = init_mlp(k_critic, [feat, *cfg.critic_shape, 1])
        return params

    def init_norm(self) -> norm_mod.NormalizerState:
        return norm_mod.init((self.cfg.obs_dim,))

    def init_stats(self) -> dict:
        if isinstance(self.cfg.head, ParticleHead):
            return heads_mod.init_activation_stats(self.cfg.head)
        return {}

    # -- forward ---------------------------------------------------------
    def _normalized(self, norm, obs):
        cfg = self.cfg
        if cfg.normalize_state:
            x = jax.lax.stop_gradient(
                norm_mod.normalize(norm, obs, clip=cfg.clip_state)
            )
        elif cfg.clip_state:
            x = jnp.clip(obs, -cfg.clip_state, cfg.clip_state)
        else:
            x = obs
        return x

    def _trunk(self, params, x):
        if self.cfg.common_shape:
            x = apply_mlp(params["common"], x, last_activation=jax.nn.relu6)
        return x

    def actor_features(self, params, norm, obs):
        x = self._trunk(params, self._normalized(norm, obs))
        if self.cfg.actor_shape:
            x = apply_mlp(params["actor_trunk"], x, last_activation=jax.nn.relu6)
        return x

    def raw_value(self, params, norm, obs):
        """Critic MLP output before any value (de)normalization."""
        x = self._trunk(params, self._normalized(norm, obs))
        v = apply_mlp(params["critic"], x)
        return v[..., 0]

    def normalized_value(self, params, norm, obs, vnorm=None):
        """Scale/offset-adjusted critic output — the quantity the value loss
        regresses against the normalized target when normalize_value is on
        (actor_critic.py:96-135: normalized_value*scale + offset, clipped)."""
        v = self.raw_value(params, norm, obs)
        if self.cfg.normalize_value and vnorm is not None:
            v = v * vnorm.scale + vnorm.offset
        if self.cfg.clip_value:
            # straight-through (actor_critic.py:96-135 clips the value path
            # with clip_by_value_with_gradient, not a hard clip)
            v = _clip_with_gradient(v, -self.cfg.clip_value,
                                    self.cfg.clip_value)
        return v

    def value(self, params, norm, obs, vnorm=None):
        """Denormalized value estimate (the one GAE/bootstraps consume)."""
        v = self.normalized_value(params, norm, obs, vnorm)
        if self.cfg.normalize_value and vnorm is not None:
            v = v * vnorm.std + vnorm.mean
        return v

    # -- policy API ------------------------------------------------------
    def act(self, params, norm, key, obs, vnorm=None):
        """Sampled action + log-prob + value + aux (rollout path)."""
        feat = self.actor_features(params, norm, obs)
        a, lp, aux = heads_mod.sample_with_log_prob(self.cfg.head, params["head"], feat, key)
        v = self.value(params, norm, obs, vnorm)
        return a, lp, v, aux

    def act_deterministic(self, params, norm, obs):
        feat = self.actor_features(params, norm, obs)
        return heads_mod.deterministic_action(self.cfg.head, params["head"], feat)

    def log_prob(self, params, norm, obs, action):
        feat = self.actor_features(params, norm, obs)
        return heads_mod.log_prob_of(self.cfg.head, params["head"], feat, action)

    def entropy(self, params, norm, obs):
        feat = self.actor_features(params, norm, obs)
        return heads_mod.entropy_of(self.cfg.head, params["head"], feat)

    def dist(self, params, norm, obs):
        feat = self.actor_features(params, norm, obs)
        return heads_mod.head_dist(self.cfg.head, params["head"], feat)

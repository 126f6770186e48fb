"""Recurrent (LSTM) actor-critic with carried per-env state.

Rebuild of the reference's episodic/sequence training capability: an LSTM
layer with explicit carried (c, h) placeholders (networks/ops.py:11-37)
trained on zero-padded [B, T] episode batches with sequence_length masking
(models/distributed_model.py:168-190, 354-370; networks/vtrace.py:67-85).

TPU-native inversion: instead of host-side padding + feed-dict state
plumbing, the carry is part of the algorithm state — threaded through the
rollout `lax.scan` (reset to zeros where an episode ends) — and the update
recomputes activations time-major over whole unrolls from the stored
unroll-initial carry, resetting at the recorded episode boundaries. No
padding is ever needed: boundaries are per-step masks.

Layout: obs -> state normalizer -> LSTM -> actor MLP -> policy head
                                        -> critic MLP -> value
(the LSTM plays the reference's `common` trunk role; both heads consume its
features, one carry per env).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from . import heads as heads_mod
from .actor_critic import ACConfig, ActorCritic
from .mlp import apply_mlp, init_mlp
from .recurrent import LSTMState, init_lstm, lstm_cell


@dataclasses.dataclass(frozen=True)
class RecurrentACConfig(ACConfig):
    lstm_hidden: int = 128


class RecurrentActorCritic(ActorCritic):
    """ActorCritic with an LSTM common trunk and explicit carried state.

    All policy/value methods take and return an LSTMState carry; the
    sequence variants consume [T, B, ...] stacks with per-step reset masks.
    """

    def __init__(self, cfg: RecurrentACConfig):
        super().__init__(cfg)

    # -- init ------------------------------------------------------------
    def init(self, key) -> dict:
        cfg = self.cfg
        k_lstm, k_actor, k_head, k_critic = jax.random.split(key, 4)
        params = {"lstm": init_lstm(k_lstm, cfg.obs_dim, cfg.lstm_hidden)}
        feat = cfg.lstm_hidden
        actor_feat = feat
        if cfg.actor_shape:
            params["actor_trunk"] = init_mlp(k_actor, [feat, *cfg.actor_shape])
            actor_feat = cfg.actor_shape[-1]
        params["head"] = heads_mod.init_head(k_head, cfg.head, actor_feat)
        params["critic"] = init_mlp(k_critic, [feat, *cfg.critic_shape, 1])
        return params

    def zero_carry(self, batch: int) -> LSTMState:
        h = self.cfg.lstm_hidden
        return LSTMState(c=jnp.zeros((batch, h)), h=jnp.zeros((batch, h)))

    # -- single step (rollout path) ---------------------------------------
    def _features_step(self, params, norm, obs, carry: LSTMState):
        x = self._normalized(norm, obs)
        new_carry, h = lstm_cell(params["lstm"], carry, x)
        return h, new_carry

    def _actor_feat(self, params, h):
        if self.cfg.actor_shape:
            return apply_mlp(params["actor_trunk"], h,
                             last_activation=jax.nn.relu6)
        return h

    def act(self, params, norm, key, obs, carry: LSTMState, vnorm=None):
        """(action, log_prob, value, aux, carry')."""
        h, new_carry = self._features_step(params, norm, obs, carry)
        feat = self._actor_feat(params, h)
        a, lp, aux = heads_mod.sample_with_log_prob(
            self.cfg.head, params["head"], feat, key)
        v = apply_mlp(params["critic"], h)[..., 0]
        return a, lp, v, aux, new_carry

    def act_deterministic(self, params, norm, obs, carry: LSTMState):
        h, new_carry = self._features_step(params, norm, obs, carry)
        feat = self._actor_feat(params, h)
        return heads_mod.deterministic_action(
            self.cfg.head, params["head"], feat), new_carry

    def value_step(self, params, norm, obs, carry: LSTMState):
        h, new_carry = self._features_step(params, norm, obs, carry)
        return apply_mlp(params["critic"], h)[..., 0], new_carry

    # -- sequence mode (update path) ---------------------------------------
    def sequence_features(self, params, norm, obs_seq, carry0: LSTMState,
                          reset_before):
        """LSTM features over a [T, B, obs] stack.

        reset_before[t] (bool [T, B]): the carry is zeroed before consuming
        obs_seq[t] — set it to done[t-1] so a new episode starts from the
        zero state, exactly like the rollout (distributed_model.py:354-362's
        reset_training_state, but per step instead of per batch).
        Returns (h_seq [T, B, hidden], carry_end).
        """

        def step(carry, inp):
            x, reset = inp
            keep = 1.0 - reset.astype(x.dtype)[..., None]
            carry = LSTMState(c=carry.c * keep, h=carry.h * keep)
            x = self._normalized(norm, x)
            carry, h = lstm_cell(params["lstm"], carry, x)
            return carry, h

        carry, hs = jax.lax.scan(step, carry0, (obs_seq, reset_before))
        return hs, carry

    def sequence_outputs(self, params, norm, obs_seq, action_seq,
                         carry0: LSTMState, reset_before,
                         want_entropy: bool = False):
        """(log_prob [T, B], value [T, B], entropy [T, B] | None) for stored
        actions — the training-time recomputation with gradients."""
        hs, _ = self.sequence_features(params, norm, obs_seq, carry0,
                                       reset_before)
        t, b = hs.shape[0], hs.shape[1]
        h_flat = hs.reshape(t * b, -1)
        feat = self._actor_feat(params, h_flat)
        a_flat = action_seq.reshape((t * b,) + action_seq.shape[2:])
        lp = heads_mod.log_prob_of(self.cfg.head, params["head"], feat,
                                   a_flat).reshape(t, b)
        v = apply_mlp(params["critic"], h_flat)[..., 0].reshape(t, b)
        ent = None
        if want_entropy:
            ent = heads_mod.entropy_of(self.cfg.head, params["head"],
                                       feat).reshape(t, b)
        return lp, v, ent

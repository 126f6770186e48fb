"""Policy evaluation / trajectory export (the reference's no-`--train` mode).

The reference reconnects PyBullet in GUI mode and plays the policy in real
time (distributed_model.py:436-444). Headless TPU pods have no GUI; instead
this rolls deterministic-policy episodes from the latest checkpoint and
writes the trajectories (link positions/orientations per frame) to an .npz
for offline viewing — any DeepMimic-compatible viewer or the bundled
tools/view_trajectory.py can replay them.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .build import build_algo
from .checkpoint import CheckpointManager
from .config import RunConfig


def rollout_trajectory(cfg: RunConfig, state, algo, num_episodes: int = 3,
                       max_steps: int = 600):
    env = algo.env
    base_env = getattr(env, "env", env)  # unwrap DiscreteActionWrapper
    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), num_episodes)
    env_state, obs = env.reset_batch(keys)

    from ..sim.dynamics import fk, link_states

    def record(env_state):
        def one(s):
            ls = link_states(base_env.tree, fk(base_env.tree, s.sim))
            return ls.frame_pos, ls.frame_quat
        return jax.vmap(one)(env_state)

    def step(carry, _):
        env_state, obs, done, ret = carry
        a = algo._actor_mode(state.params, state.norm, obs) if hasattr(algo, "_actor_mode") \
            else algo.net.act_deterministic(state.params, state.norm, obs)
        res = env.step_batch(env_state, algo._clip_action(a))
        ret = ret + jnp.where(done, 0.0, res.reward)
        done = jnp.logical_or(done, res.done)
        pos, quat = record(res.state)
        return (res.state, res.obs, done, ret), (pos, quat, done)

    init = (env_state, obs, jnp.zeros(num_episodes, bool), jnp.zeros(num_episodes))
    (_, _, _, ret), (pos, quat, done) = jax.lax.scan(step, init, None, length=max_steps)
    return np.asarray(pos), np.asarray(quat), np.asarray(done), np.asarray(ret)


def visualize(cfg: RunConfig, root: str = ".", num_episodes: int = 3):
    algo = build_algo(cfg)
    state = algo.init_state(jax.random.PRNGKey(cfg.seed))
    ckpt = CheckpointManager(cfg.checkpoint_dir(root))
    restored = ckpt.restore_latest(state)
    if restored is None:
        print(f"[SYSTEM] no checkpoint found in {cfg.checkpoint_dir(root)}")
        return
    state = restored
    pos, quat, done, ret = rollout_trajectory(cfg, state, algo, num_episodes)
    out = os.path.join(cfg.log_dir(root), "trajectory.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    tree = getattr(algo.env, "env", algo.env).tree
    np.savez(out, link_pos=pos, link_quat=quat, done=done,
             link_names=np.array(tree.link_names))
    print(f"[SYSTEM] episode rewards: {ret}")
    print(f"[SYSTEM] wrote trajectory to {out}")

#!/usr/bin/env python3
"""Per-term reward replay of a shipped policy npz (diagnostic).

The DeepMimic reward is a weighted sum of five exp-of-error imitation
terms (reference envs/deepmimic.py:594-753). Training logs only expose
the sum; this tool replays a deterministic policy and reports each term
separately — bucketed by motion phase — to localize WHERE in the clip a
task loses reward (e.g. the kick's flight/plant phase vs the support
phase). Used for the Kick gap analysis in results/README.md.

CPU-friendly: run with JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= to keep
off a busy TPU tunnel (CLAUDE.md caveats 1/4).

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/reward_term_replay.py \
      --play results/policies/DeepMimicKick-v0_..._step58608.npz \
      --env DeepMimicKick-v0 --setting deepmimic_dppo_pfpn --particles 35
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--play", required=True, help="policy npz (export_policy.py)")
    ap.add_argument("--env", required=True)
    ap.add_argument("--setting", required=True)
    ap.add_argument("--particles", type=int, default=35)
    ap.add_argument("--episodes", type=int, default=5)
    ap.add_argument("--max_steps", type=int, default=600)
    ap.add_argument("--bins", type=int, default=10, help="phase buckets")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from export_policy import unflatten
    from pfpn_tpu.harness.build import build_algo
    from pfpn_tpu.harness.settings import build

    cfg = build(args.setting, particles=args.particles, env=args.env)
    algo = build_algo(cfg)
    env = algo.env
    base_env = getattr(env, "env", env)

    data = dict(np.load(args.play))
    params = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        unflatten({k[len("params/"):]: v for k, v in data.items()
                   if k.startswith("params/")}))
    norm = algo.net.init_norm()
    norm = norm._replace(**{k[len("norm/"):]: jnp.asarray(v, jnp.float32)
                            for k, v in data.items() if k.startswith("norm/")})

    keys = jax.random.split(jax.random.PRNGKey(0), args.episodes)
    env_state, obs = env.reset_batch(keys)

    def act(obs):
        if hasattr(algo, "_actor_mode"):
            return algo._actor_mode(params, norm, obs)
        return algo.net.act_deterministic(params, norm, obs)

    def step(carry, _):
        env_state, obs, done = carry
        res = env.step_batch(env_state, algo._clip_action(act(obs)))
        terms = jax.vmap(base_env.reward_terms)(res.state, res.terminated)
        phase = jax.vmap(base_env.phase)(res.state)
        alive = ~done
        done = jnp.logical_or(done, res.done)
        return (res.state, res.obs, done), (terms, phase, alive,
                                            res.reward, res.terminated)

    init = (env_state, obs, jnp.zeros(args.episodes, bool))
    _, (terms, phase, alive, reward, terminated) = jax.lax.scan(
        step, init, None, length=args.max_steps)

    terms = {k: np.asarray(v) for k, v in terms.items()}   # (T, E)
    phase = np.asarray(phase)
    alive = np.asarray(alive)
    reward = np.asarray(reward)
    terminated = np.asarray(terminated)

    names = sorted(terms)
    # where-mask, not multiply: post-done physics of a fallen pose can NaN,
    # and NaN * 0 == NaN would poison the episode return
    ret = np.where(alive, reward, 0.0).sum(axis=0)
    falls = (terminated & alive).any(axis=0)
    print(f"[TERMS] {args.env} {os.path.basename(args.play)}")
    print(f"  episode returns: {np.round(ret, 1)}  falls: {falls.tolist()}")

    m = alive
    print(f"  alive steps: {int(m.sum())} / {m.size}")
    print("  mean per-step term (weighted; sums to reward):")
    for k in names:
        print(f"    {k:8s} {float(terms[k][m].mean()):.4f}")

    # phase-bucketed means: localize the weak window in the clip
    edges = np.linspace(0.0, 1.0, args.bins + 1)
    print(f"  phase-bucketed ({args.bins} bins): " + "  ".join(names))
    for b in range(args.bins):
        sel = m & (phase >= edges[b]) & (phase < edges[b + 1])
        if not sel.any():
            continue
        row = "  ".join(f"{float(terms[k][sel].mean()):.3f}" for k in names)
        tot = sum(float(terms[k][sel].mean()) for k in names)
        print(f"    [{edges[b]:.1f},{edges[b+1]:.1f}) n={int(sel.sum()):5d}  "
              f"{row}  | sum {tot:.3f}")


if __name__ == "__main__":
    main()

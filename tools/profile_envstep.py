#!/usr/bin/env python3
"""Env-step-level profiling on the real TPU: megastep kernel vs the
reward/observation/auto-reset epilogue around it.

Same stateful-scan methodology as tools/profile_substep.py (CLAUDE.md TPU
caveats). Usage: python tools/profile_envstep.py [--batch 8192] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed_scan(name, body, init, iters, fetch):
    def roll(carry):
        def step(c, _):
            return body(c), None
        carry, _ = jax.lax.scan(step, carry, None, length=iters)
        return fetch(carry)

    f = jax.jit(roll)
    t0 = time.time()
    float(f(init))
    compile_s = time.time() - t0
    t0 = time.time()
    float(f(init))
    dt = time.time() - t0
    per = dt / iters
    print(f"{name:44s} {per * 1e6:10.1f} us/iter  (compile {compile_s:.0f}s)",
          flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--only", type=str, default=None)
    args = ap.parse_args()
    B, iters = args.batch, args.iters
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    print("devices:", jax.devices(), flush=True)

    from pfpn_tpu.envs.deepmimic import make

    env = make("DeepMimicWalk-v0")
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    est, _ = jax.jit(env.reset_batch)(keys)

    def jiggle(st, x):
        eps = 1e-12 * jnp.sum(x)
        return st.replace(sim=st.sim.replace(base_pos=st.sim.base_pos + eps))

    a0 = jnp.zeros((B, env.action_size))

    # ---- full pipeline variants -----------------------------------------
    if want("autoreset"):
        def body(carry):
            st, k = carry
            k, ka, kr = jax.random.split(k, 3)
            a = jax.random.uniform(ka, (B, env.action_size),
                                   minval=-0.2, maxval=0.2)
            st, o, res = env.step_autoreset(st, a, jax.random.split(kr, B))
            st = jiggle(st, res.reward)
            return (st, k)
        timed_scan("step_autoreset (bench path)", body, (est, jax.random.PRNGKey(1)),
                   iters, lambda c: jnp.sum(c[0].sim.base_pos))

    if want("step"):
        def body(carry):
            st, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (B, env.action_size),
                                   minval=-0.2, maxval=0.2)
            res = env.step_batch(st, a)
            return (jiggle(res.state, res.reward), k)
        timed_scan("step_batch (no autoreset)", body, (est, jax.random.PRNGKey(1)),
                   iters, lambda c: jnp.sum(c[0].sim.base_pos))

    if want("mega"):
        # megastep kernel + wrap bookkeeping only (no term/reward/obs)
        def one(st):
            a = env.unnormalize_action(jnp.zeros(env.action_size))
            t_sph, t_rev, _ = env._action_to_targets(a)
            sim, active, hist = env.engine.control_step_full(
                st.sim, t_sph, t_rev)
            return st.replace(sim=sim,
                              elapsed_time=st.elapsed_time + env.frame_skip * env.dt)
        def body(st):
            return jax.vmap(one)(st)
        timed_scan("megastep only", body, est, iters,
                   lambda c: jnp.sum(c.sim.base_pos))

    if want("reward"):
        term = jnp.zeros(B, dtype=bool)
        def body(st):
            r = jax.vmap(lambda s: env.reward(s, jnp.zeros((), bool)))(st)
            return jiggle(st, r)
        timed_scan("reward alone (incl. fk+link_states)", body, est, iters,
                   lambda c: jnp.sum(c.sim.base_pos))

    if want("observe"):
        def body(st):
            o = jax.vmap(env.observe)(st)
            return jiggle(st, o)
        timed_scan("observe alone (incl. fk+link_states)", body, est, iters,
                   lambda c: jnp.sum(c.sim.base_pos))

    if want("reset"):
        def body(carry):
            st, k = carry
            k, kr = jax.random.split(k)
            st2, o = env.reset_batch(jax.random.split(kr, B))
            st2 = jiggle(st2, o)
            return (st2, k)
        timed_scan("reset_batch alone", body, (est, jax.random.PRNGKey(1)),
                   iters, lambda c: jnp.sum(c[0].sim.base_pos))

    if want("act2tgt"):
        def body(carry):
            st, k = carry
            k, ka = jax.random.split(k)
            a = jax.random.uniform(ka, (B, env.action_size),
                                   minval=-0.2, maxval=0.2)
            t_sph, t_rev, _ = jax.vmap(
                lambda x: env._action_to_targets(env.unnormalize_action(x)))(a)
            st = jiggle(st, t_sph)
            return (st, k)
        timed_scan("action->targets alone", body, (est, jax.random.PRNGKey(1)),
                   iters, lambda c: jnp.sum(c[0].sim.base_pos))

    # ---- policy cost (the policy-in-loop vs random-action gap) ----------
    if want("policy") or want("policy_head"):
        from pfpn_tpu.harness.build import build_env, build_net
        from pfpn_tpu.harness.settings import build as build_cfg

        cfg = build_cfg("deepmimic_dppo_pfpn", particles=35)
        net = build_net(cfg, env)
        params = net.init(jax.random.PRNGKey(0))
        norm = net.init_norm()
        obs0 = jax.jit(lambda s: jax.vmap(env.observe)(s))(est)

        if want("policy"):
            def body(carry):
                obs, k = carry
                k, ka = jax.random.split(k)
                a, lp, v, _aux = net.act(params, norm, ka, obs)
                # data-dependent jiggle so the scan can't hoist the act
                jig = jnp.sum(a) + jnp.sum(lp) + jnp.sum(v)
                return (obs + 1e-12 * jig, k)
            timed_scan("net.act alone (PFPN-35 sample+value)", body,
                       (obs0, jax.random.PRNGKey(1)), iters,
                       lambda c: jnp.sum(c[0]))

        if want("policy_head"):
            feat0 = jax.jit(
                lambda o: net.actor_features(params, norm, o))(obs0)
            from pfpn_tpu.networks import heads as heads_mod

            def body(carry):
                feat, k = carry
                k, ka = jax.random.split(k)
                a, lp, _aux = heads_mod.sample_with_log_prob(
                    net.cfg.head, params["head"], feat, ka)
                return (feat + 1e-12 * jnp.sum(a), k)
            timed_scan("particle head sample alone", body,
                       (feat0, jax.random.PRNGKey(1)), iters,
                       lambda c: jnp.sum(c[0]))


if __name__ == "__main__":
    main()

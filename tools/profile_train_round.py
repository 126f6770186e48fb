#!/usr/bin/env python3
"""Wall-clock breakdown of a DPPO *training round* on the real TPU.

VERDICT r4 item 4: MFU.md shows training is update-bound relative to the
sim kernel, but no profile of the train round itself exists. This tool
splits one round into its pieces and measures each with the stateful
scan-inside-one-jit methodology (CLAUDE.md TPU caveats 2/3 — never time
individual jitted calls through the tunnel):

  * fused round  — K train_rounds chained in one lax.scan (device time)
  * host loop    — K rounds driven exactly like harness/train.py does
                   (per-round jit dispatch + metrics fetch); the delta vs
                   the fused number is the real per-round host overhead
  * rollout only — K chained rollouts (every traj leaf summed into the
                   output so XLA cannot dead-code the value/log-prob work)
  * update only  — K chained updates on one captured trajectory
  * evaluate     — R chained deterministic evals (amortized /50 rounds,
                   the harness cadence)

Usage: python tools/profile_train_round.py [--setting deepmimic_dppo_pfpn]
           [--mult 1] [--rounds 8] [--evals 2]
Writes one table per invocation; run once with --mult 1 (exactgeom) and
once with --mult 8 for the TRAIN_PROFILE.md comparison.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _sum_leaves(tree):
    return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree))


def timed(name, fn, *args, reps):
    """fn is already jitted and already includes the rep count."""
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    compile_s = time.time() - t0
    t0 = time.time()
    out = fn(*args)
    float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = time.time() - t0
    per = dt / reps
    print(f"{name:34s} {per * 1e3:10.2f} ms/iter  "
          f"(compile {compile_s:.0f}s, {reps} reps)", flush=True)
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--setting", default="deepmimic_dppo_pfpn")
    ap.add_argument("--env", default="DeepMimicWalk-v0")
    ap.add_argument("--mult", type=int, default=1)
    ap.add_argument("--particles", type=int, default=35)
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--evals", type=int, default=2)
    ap.add_argument("--unroll", type=int, default=0,
                    help="override unroll_length (CPU smoke)")
    ap.add_argument("--eval_steps", type=int, default=600)
    args = ap.parse_args()

    print("devices:", jax.devices(), flush=True)
    import dataclasses

    from pfpn_tpu.harness.build import build_algo
    from pfpn_tpu.harness.settings import build as build_cfg

    cfg = build_cfg(args.setting, particles=args.particles, env=args.env,
                    env_multiplier=args.mult)
    if args.unroll:
        cfg = dataclasses.replace(
            cfg, worker=dataclasses.replace(cfg.worker,
                                            unroll_length=args.unroll))
    algo = build_algo(cfg)
    acfg = algo.cfg
    samples_round = acfg.num_envs * acfg.unroll_length
    n_grad = (samples_round // acfg.minibatch_size) * (acfg.opt_epochs or 1)
    print(f"setting={args.setting} mult={args.mult} envs={acfg.num_envs} "
          f"unroll={acfg.unroll_length} minibatch={acfg.minibatch_size} "
          f"-> {samples_round} samples/round, {n_grad} grad steps/round",
          flush=True)

    state = algo.init_state(jax.random.PRNGKey(0))
    K, R = args.rounds, args.evals

    # ---- fused round, K chained in one program -------------------------
    def rounds_k(st):
        def body(c, _):
            c, m = algo.train_round(c)
            return c, m["loss"]
        st, losses = jax.lax.scan(body, st, None, length=K)
        # loss depends on the whole round's compute — DCE-proof output
        return jnp.sum(losses)

    t_round = timed("fused train_round (device)", jax.jit(rounds_k), state,
                    reps=K)

    # ---- host-driven loop (the harness's actual shape) ------------------
    train_round = jax.jit(algo.train_round)
    st, metrics = train_round(state)          # warm the cache
    _ = {k: np.asarray(v) for k, v in metrics.items()}
    t0 = time.time()
    for _ in range(K):
        st, metrics = train_round(st)
        _ = {k: np.asarray(v) for k, v in metrics.items()}
        float(np.asarray(metrics["total_samples"]))
    t_host = (time.time() - t0) / K
    print(f"{'host-driven round (train.py shape)':34s} {t_host * 1e3:10.2f} "
          f"ms/iter  (no extra compile, {K} reps)", flush=True)

    # ---- rollout only ----------------------------------------------------
    def rollouts_k(st):
        def body(c, _):
            c2, traj = algo.rollout(c)
            return c2, _sum_leaves(traj)
        st, sums = jax.lax.scan(body, st, None, length=K)
        return jnp.sum(sums) + st.total_samples.astype(jnp.float32)

    t_roll = timed("rollout only", jax.jit(rollouts_k), state, reps=K)

    # ---- update only (one captured trajectory) ---------------------------
    _, traj0 = jax.jit(algo.rollout)(state)
    traj0 = jax.block_until_ready(traj0)

    def updates_k(st, traj):
        def body(c, _):
            c2, m = algo.update(c, traj)
            return c2, m["loss"]
        st, losses = jax.lax.scan(body, st, None, length=K)
        return jnp.sum(losses)

    t_upd = timed("update only", jax.jit(updates_k), state, traj0, reps=K)

    # ---- evaluate (10 episodes x 600 frames, harness cadence /50) --------
    def evals_r(params, norm, key):
        def body(k, _):
            k, ke = jax.random.split(k)
            out = algo.evaluate(params, norm, ke, num_episodes=10,
                                max_steps=args.eval_steps)
            return k, jnp.sum(out["reward"]) + jnp.sum(out["frames"])
        _, sums = jax.lax.scan(body, key, None, length=R)
        return jnp.sum(sums)

    t_eval = timed("evaluate (10 eps, per call)",
                   jax.jit(evals_r), state.params, state.norm,
                   jax.random.PRNGKey(7), reps=R)

    # ---- table -----------------------------------------------------------
    host_overhead = t_host - t_round
    eval_amort = t_eval / 50.0
    total = t_host + eval_amort
    print("\n--- breakdown (ms per round) ---", flush=True)
    rows = [
        (f"rollout (sim+policy, {acfg.unroll_length} steps)", t_roll * 1e3),
        (f"update ({n_grad} grad steps)", t_upd * 1e3),
        ("fusion delta (round - roll - upd)",
         (t_round - t_roll - t_upd) * 1e3),
        ("host+dispatch (host loop - fused)", host_overhead * 1e3),
        ("eval amortized (/50 rounds)", eval_amort * 1e3),
        ("TOTAL (host round + eval amort)", total * 1e3),
    ]
    for name, ms in rows:
        print(f"{name:40s} {ms:10.2f} ms  {100 * ms / (total * 1e3):5.1f}%",
              flush=True)
    print(f"\nsamples/round: {samples_round}  ->  steady-state "
          f"{samples_round / total:,.0f} samples/s "
          f"(rollout-only ceiling {samples_round / t_roll:,.0f}, "
          f"update-only ceiling {samples_round / t_upd:,.0f})", flush=True)


if __name__ == "__main__":
    main()

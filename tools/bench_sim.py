#!/usr/bin/env python3
"""Honest simulator throughput measurement (state-evolving scan, host fetch).

The remote TPU tunnel adds ~30 ms per jitted call and hoists loop-invariant
computation, so all timing here scans a *stateful* rollout inside one jit
and divides by the step count.

Usage: python tools/bench_sim.py [--batch 1024 2048] [--steps 20]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp


def bench_env(batch_sizes, n_steps, motion="walk"):
    from pfpn_tpu.envs.deepmimic import make

    env = make(f"DeepMimic{motion.capitalize()}-v0")
    results = {}
    for b in batch_sizes:
        keys = jax.random.split(jax.random.PRNGKey(0), b)
        state, _ = jax.jit(env.reset_batch)(keys)

        def roll(st, key):
            def body(carry, _):
                st, k = carry
                k, ka, kr = jax.random.split(k, 3)
                a = jax.random.uniform(
                    ka, (b, env.action_size), minval=-0.2, maxval=0.2
                )
                st, o, res = env.step_autoreset(st, a, jax.random.split(kr, b))
                return (st, k), jnp.sum(res.reward)

            (st, _), rs = jax.lax.scan(body, (st, key), None, length=n_steps)
            return st, jnp.sum(rs)

        f = jax.jit(roll)
        t0 = time.time()
        st2, r = f(state, jax.random.PRNGKey(1))
        float(r)
        compile_time = time.time() - t0

        t0 = time.time()
        st2, r = f(st2, jax.random.PRNGKey(2))
        float(r)
        dt = time.time() - t0
        steps_per_s = b * n_steps / dt
        results[b] = steps_per_s
        print(
            f"B={b}: {n_steps} ctrl steps in {dt:.2f}s -> "
            f"{steps_per_s:,.0f} env steps/s "
            f"({steps_per_s * 20:,.0f} substeps/s) [compile {compile_time:.0f}s]",
            flush=True,
        )
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, nargs="+", default=[1024, 4096])
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()
    print("devices:", jax.devices())
    bench_env(args.batch, args.steps)

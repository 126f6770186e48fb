#!/usr/bin/env python3
"""Driver benchmark: humanoid DeepMimic simulation throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md north star): >= 1M humanoid env steps/s on a TPU
v4-8 (8 chips) => 125k env steps/s per chip. vs_baseline is measured
throughput / (125k * n_devices).

Methodology: vmapped DeepMimicWalk envs (SPD control, 20 physics substeps
per env step, contacts, reward, auto-reset) driven by random actions inside
one jitted lax.scan; timing excludes compilation and uses a host fetch to
defeat async dispatch.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def measure(batch: int, n_steps: int):
    from pfpn_tpu.envs.deepmimic import make

    env = make("DeepMimicWalk-v0")
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    state, _ = jax.jit(env.reset_batch)(keys)

    def roll(st, key):
        def body(carry, _):
            st, k = carry
            k, ka, kr = jax.random.split(k, 3)
            a = jax.random.uniform(
                ka, (batch, env.action_size), minval=-0.2, maxval=0.2
            )
            st, o, res = env.step_autoreset(st, a, jax.random.split(kr, batch))
            return (st, k), jnp.sum(res.reward)

        (st, _), rs = jax.lax.scan(body, (st, key), None, length=n_steps)
        return st, jnp.sum(rs)

    f = jax.jit(roll)
    st, r = f(state, jax.random.PRNGKey(1))
    float(r)  # compile + warm
    t0 = time.time()
    st, r = f(st, jax.random.PRNGKey(2))
    float(r)  # force completion
    dt = time.time() - t0
    return batch * n_steps / dt


def main():
    n_dev = len(jax.devices())
    batch = int(os.environ.get("PFPN_BENCH_BATCH", 1024)) * n_dev
    n_steps = int(os.environ.get("PFPN_BENCH_STEPS", 15))
    # the remote TPU tunnel occasionally throws transient INVALID_ARGUMENT
    # errors (single-client backend); retry with a cooldown
    last_err = None
    for attempt in range(3):
        try:
            steps_per_s = measure(batch, n_steps)
            break
        except Exception as e:  # noqa: BLE001
            last_err = e
            time.sleep(120)
    else:
        raise last_err
    target = 125_000.0 * n_dev
    print(json.dumps({
        "metric": "deepmimic_walk_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_s / target, 4),
    }))


if __name__ == "__main__":
    main()

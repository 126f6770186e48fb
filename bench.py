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
import re
import sys
import time
import traceback

# Deterministic failure signatures: a retry can never fix these, so fail
# fast with the real traceback instead of burning minutes in the backoff
# loop (round-4 post-mortem: the tile-sweep >=256 failures and the DDPG
# Mosaic error were both mislabeled "transient" and lost their root cause).
_FATAL_RE = re.compile(
    r"Mosaic failed to compile|failed to legalize|infer-vector-layout"
    r"|RESOURCE_EXHAUSTED|INTERNAL: Mosaic|Unsupported|NotImplementedError",
    re.IGNORECASE,
)


def _is_transient(exc: Exception) -> bool:
    return _FATAL_RE.search(f"{type(exc).__name__}: {exc}") is None

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Default the megastep kernel to the sublane-batched layout (8 envs in
# sublanes x 128 lanes = 1024 envs/block): measured +16% sim throughput
# at B=8192 (182.2k vs 157.3k env steps/s, results/MFU.md round 5).
# Explicitly setting PFPN_MEGASTEP_SB (even empty = sb 1) overrides; on
# a fatal sb>1 compile error main() falls back to the lane-only layout.
os.environ.setdefault("PFPN_MEGASTEP_SB", "8")

import jax
import jax.numpy as jnp


def _compile_opts():
    """The sb=8 kernel needs ~17 MiB of scoped VMEM vs the 16 MiB
    default budget — raise it through PJRT compile options (the channel
    that reaches the remote axon compiler; an XLA_FLAGS env would abort
    the local CPU xla, which does not know the TPU-only flag)."""
    sb = os.environ.get("PFPN_MEGASTEP_SB", "")
    if sb and sb != "1":
        return {"xla_tpu_scoped_vmem_limit_kib": 65536}
    return None


def measure(batch: int, n_steps: int):
    from pfpn_tpu.envs.deepmimic import make

    # PFPN_BENCH_ENV=DeepMimicMultiTask-v0 measures the multi-task batch
    # (walk+punch+kick slices in one jitted program, envs/multitask.py)
    env = make(os.environ.get("PFPN_BENCH_ENV", "DeepMimicWalk-v0"))
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

    f = jax.jit(roll).lower(state, jax.random.PRNGKey(1)).compile(
        compiler_options=_compile_opts())
    st, r = f(state, jax.random.PRNGKey(1))
    float(r)  # warm
    t0 = time.time()
    st, r = f(st, jax.random.PRNGKey(2))
    float(r)  # force completion
    dt = time.time() - t0
    return batch * n_steps / dt


def measure_policy(batch: int, n_steps: int):
    """Policy-in-the-loop throughput: the number training actually sees —
    PFPN-35 policy sampling + obs normalizer + env step per iteration."""
    import jax.numpy as jnp

    from pfpn_tpu.harness.build import build_env, build_net
    from pfpn_tpu.harness.settings import build as build_cfg

    cfg = build_cfg("deepmimic_dppo_pfpn", particles=35)
    env = build_env(cfg)
    net = build_net(cfg, env)
    key = jax.random.PRNGKey(0)
    params = net.init(key)
    norm = net.init_norm()
    state, obs = jax.jit(env.reset_batch)(jax.random.split(key, batch))
    low = jnp.asarray(env.action_low)
    high = jnp.asarray(env.action_high)

    def roll(st, obs, key):
        def body(carry, _):
            st, obs, k = carry
            k, ka, kr = jax.random.split(k, 3)
            a, lp, v, _aux = net.act(params, norm, ka, obs)
            st, obs, res = env.step_autoreset(
                st, jnp.clip(a, low, high), jax.random.split(kr, batch))
            return (st, obs, k), jnp.sum(res.reward)

        (st, obs, _), rs = jax.lax.scan(body, (st, obs, key), None,
                                        length=n_steps)
        return st, jnp.sum(rs)

    f = jax.jit(roll).lower(state, obs, jax.random.PRNGKey(1)).compile(
        compiler_options=_compile_opts())
    st, r = f(state, obs, jax.random.PRNGKey(1))
    float(r)
    t0 = time.time()
    st, r = f(st, obs, jax.random.PRNGKey(2))
    float(r)
    return batch * n_steps / (time.time() - t0)


def main():
    n_dev = len(jax.devices())
    batch = int(os.environ.get("PFPN_BENCH_BATCH", 8192)) * n_dev
    n_steps = int(os.environ.get("PFPN_BENCH_STEPS", 15))
    # the remote TPU tunnel occasionally throws transient INVALID_ARGUMENT
    # errors (single-client backend — e.g. a queued trainer holding the
    # tunnel when the driver launches this); after a client collision the
    # backend needs ~2-3 min to recover, so retry with a growing cooldown
    last_err = None
    for attempt in range(5):
        try:
            steps_per_s = measure(batch, n_steps)
            break
        except (ValueError, TypeError, KeyError):
            raise  # deterministic config error (e.g. bad PFPN_BENCH_ENV)
        except Exception as e:  # noqa: BLE001
            if not _is_transient(e):
                if os.environ.get("PFPN_MEGASTEP_SB", "") not in ("", "1"):
                    # the sublane-batched kernel is an optimization, not
                    # a requirement — degrade to the lane-only layout
                    # instead of failing the driver bench
                    print(f"[bench] sb>1 fatal compile error; falling "
                          f"back to PFPN_MEGASTEP_SB=1: "
                          f"{type(e).__name__}: {e}", file=sys.stderr)
                    os.environ["PFPN_MEGASTEP_SB"] = "1"
                    continue
                # compile/Mosaic/OOM: deterministic — surface immediately
                traceback.print_exc()
                raise
            last_err = e
            print(f"[bench] transient backend error (attempt {attempt}): "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            time.sleep(120 + 60 * attempt)
    else:
        raise last_err
    try:
        policy_steps_per_s = measure_policy(batch, n_steps)
    except Exception:  # the sim number is the driver deliverable
        traceback.print_exc()  # but never silently: stderr keeps the cause
        policy_steps_per_s = None
    target = 125_000.0 * n_dev
    out = {
        "metric": "deepmimic_walk_env_steps_per_s",
        "value": round(steps_per_s, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(steps_per_s / target, 4),
    }
    if policy_steps_per_s is not None:
        out["policy_in_loop_steps_per_s"] = round(policy_steps_per_s, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

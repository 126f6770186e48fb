#!/usr/bin/env python3
"""Megastep sublane-batch (PFPN_MEGASTEP_SB) smoke + throughput probe.

One configuration per process (the SB/TILE env vars are read at trace
time), so the A/B runs as separate serialized invocations — CLAUDE.md
TPU caveat 1. Methodology per caveats 2/3: a *stateful* scan of full env
steps inside one jit, scalar fetch, divide by step count; compile and
measure phases are printed separately so a Mosaic hang is attributable
(VERDICT r4 item 3: the round-4 tile sweep lost its failure modes to
retry/backoff).

Env knobs: PFPN_MEGASTEP_SB, PFPN_MEGASTEP_TILE, SB_SMOKE_B (batch),
SB_SMOKE_STEPS (control steps per measured scan).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    b = int(os.environ.get("SB_SMOKE_B", "8192"))
    n_steps = int(os.environ.get("SB_SMOKE_STEPS", "20"))
    sb = os.environ.get("PFPN_MEGASTEP_SB", "(unset=1)")
    tile = os.environ.get("PFPN_MEGASTEP_TILE", "(unset=128)")
    print(f"devices: {jax.devices()}", flush=True)
    print(f"config: SB={sb} TILE={tile} B={b} steps={n_steps}", flush=True)

    from pfpn_tpu.envs.deepmimic import make

    t0 = time.time()
    env = make("DeepMimicWalk-v0")
    print(f"env make ok ({time.time() - t0:.0f}s)", flush=True)
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    t0 = time.time()
    state, _ = jax.jit(env.reset_batch)(keys)
    jax.block_until_ready(state.sim.base_pos)
    print(f"reset_batch ok ({time.time() - t0:.0f}s)", flush=True)

    def roll(st, key):
        def body(carry, _):
            st, k = carry
            k, ka, kr = jax.random.split(k, 3)
            a = jax.random.uniform(
                ka, (b, env.action_size), minval=-0.2, maxval=0.2)
            st, o, res = env.step_autoreset(st, a, jax.random.split(kr, b))
            return (st, k), jnp.sum(res.reward)

        (st, _), rs = jax.lax.scan(body, (st, key), None, length=n_steps)
        return st, jnp.sum(rs)

    # SB_SMOKE_VMEM_KIB raises XLA's scoped-vmem budget (default 16 MiB)
    # through PJRT compile options — the reliable channel to the remote
    # axon compiler, unlike the XLA_FLAGS env of the client process
    vmem_kib = os.environ.get("SB_SMOKE_VMEM_KIB", "")
    copts = ({"xla_tpu_scoped_vmem_limit_kib": int(vmem_kib)}
             if vmem_kib else None)
    f = jax.jit(roll)
    t0 = time.time()
    lowered = f.lower(state, jax.random.PRNGKey(1))
    print(f"lowered ({time.time() - t0:.0f}s)", flush=True)
    t0 = time.time()
    compiled = lowered.compile(compiler_options=copts)
    print(f"compiled ({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    st2, r = compiled(state, jax.random.PRNGKey(1))
    float(r)
    print(f"first run ok ({time.time() - t0:.1f}s, reward sum {float(r):.1f})",
          flush=True)

    t0 = time.time()
    st2, r = compiled(st2, jax.random.PRNGKey(2))
    float(r)
    dt = time.time() - t0
    sps = b * n_steps / dt
    print(f"RESULT SB={sb} TILE={tile} B={b}: {n_steps} ctrl steps in "
          f"{dt:.2f}s -> {sps:,.0f} env steps/s "
          f"({sps * env.engine.config.frame_skip:,.0f} substeps/s)",
          flush=True)


if __name__ == "__main__":
    main()

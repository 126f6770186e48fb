#!/usr/bin/env python3
"""MFU / roofline statement for the megastep kernel (VERDICT r3 weak #7).

Counts the *useful* arithmetic of one DeepMimic control step (20 physics
substeps + SPD + contacts + reward/obs/auto-reset — the exact math
ops/megastep.py implements; the unbatched custom_vmap path runs the same
computation through the plain engine, sim/engine.py:57) with XLA's own cost
model, then converts a measured TPU throughput into achieved FLOP/s and
places it against the v5e rooflines.

Run CPU-side (never against the tunnel):
  PALLAS_AXON_POOL_IPS= python tools/mfu_megastep.py [steps_per_s]

steps_per_s defaults to the latest driver bench (BENCH_r03.json). The FLOP
count is XLA's static estimate of the unbatched program — transcendentals
count 1, fused multiply-adds 2 — i.e. a *useful-math* numerator, which is
what MFU wants (the kernel's own redundant lane work would inflate it).

v5e peaks (public numbers, jax-ml.github.io/scaling-book `tpu` chapter):
  MXU  bf16        197   TFLOP/s   (matmul path — the kernel barely uses it)
  MXU  fp32        ~49   TFLOP/s   (bf16x3-pass effective rate, ~1/4)
  VPU  fp32        ~3.9  TFLOP/s   (8x128 lanes x 4 ALUs x ~0.94 GHz)
  HBM              819   GB/s
"""

import json
import os
import sys

# NOTE: setting this here is too late to be a guarantee — sitecustomize
# imports jax at interpreter start, which can already open a tunnel
# connection (CLAUDE.md TPU caveat 4). The env-var *prefix* in the usage
# line is the real guard; warn loudly when it was omitted.
if "PALLAS_AXON_POOL_IPS" not in os.environ:
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    print("[WARN] PALLAS_AXON_POOL_IPS was not set at interpreter start; "
          "sitecustomize may have opened a tunnel connection already. If a "
          "TPU job is training, rerun as: PALLAS_AXON_POOL_IPS= python "
          "tools/mfu_megastep.py", file=sys.stderr, flush=True)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VPU_FP32 = 3.9e12
MXU_BF16 = 197e12
HBM_BPS = 819e9


def count_env_step():
    """XLA flop/byte estimate of ONE env control step (batch 1)."""
    from pfpn_tpu.envs.deepmimic import make

    env = make("DeepMimicWalk-v0")
    key = jax.random.PRNGKey(0)
    state, _ = env.reset_batch(jax.random.split(key, 1))

    def one_step(st, a, k):
        return env.step_autoreset(st, a, k)

    a = jnp.zeros((1, env.action_size))
    ks = jax.random.split(key, 1)
    compiled = jax.jit(one_step).lower(state, a, ks).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per executable
        ca = ca[0]
    return ca


def main():
    steps_per_s = None
    if len(sys.argv) > 1:
        steps_per_s = float(sys.argv[1])
    else:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for name in sorted(os.listdir(root), reverse=True):
            if name.startswith("BENCH_r") and name.endswith(".json"):
                with open(os.path.join(root, name)) as f:
                    d = json.load(f)
                    steps_per_s = float(d.get("parsed", d)["value"])
                print(f"# throughput from {name}")
                break
    assert steps_per_s, "pass steps_per_s or provide a BENCH_r*.json"

    ca = count_env_step()
    flops = float(ca.get("flops", 0.0))
    transc = float(ca.get("transcendentals", 0.0))
    nbytes = float(ca.get("bytes accessed", 0.0))
    useful = flops + transc

    achieved = useful * steps_per_s
    print(f"env control step (20 substeps + SPD + contacts + reward/obs):")
    print(f"  useful FLOPs/step   {useful:,.0f}  "
          f"(flops {flops:,.0f} + transcendental {transc:,.0f})")
    print(f"  bytes/step (B=1)    {nbytes:,.0f}")
    print(f"throughput            {steps_per_s:,.0f} env steps/s")
    print(f"achieved              {achieved/1e9:,.1f} GFLOP/s")
    print(f"  vs VPU fp32 peak    {100*achieved/VPU_FP32:.2f}%  (3.9 TFLOP/s)")
    print(f"  vs MXU bf16 peak    {100*achieved/MXU_BF16:.3f}%  (197 TFLOP/s)")
    # state-resident working set: the kernel keeps per-env state in VMEM, so
    # HBM traffic/step is ~(state in + state out); report the B=1 bound.
    print(f"  HBM bound if B=1 bytes repeated per env: "
          f"{100*nbytes*steps_per_s/HBM_BPS:.2f}% of 819 GB/s")
    arith = useful / max(nbytes, 1.0)
    print(f"  arithmetic intensity (vs B=1 bytes) {arith:.2f} FLOP/byte")


if __name__ == "__main__":
    main()

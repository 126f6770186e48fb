#!/usr/bin/env python3
"""Export a trained policy (params + obs normalizer) to a compact fp16 npz.

Parity with the reference's shipped pretrained checkpoints
(ckpt_DeepMimic*/deepmimic_dppo_pfpn_particle35/<seed>/, README.md:49-56):
the npz under results/policies/ is the deployable artifact; load it with
--play to run deterministic evaluation episodes.

Usage:
  python tools/export_policy.py --env DeepMimicKick-v0 \
      --setting deepmimic_dppo_pfpn --particles 35 --seed 34114
  python tools/export_policy.py --play results/policies/<file>.npz \
      --env DeepMimicKick-v0 --setting deepmimic_dppo_pfpn --particles 35
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten(v, f"{prefix}#{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.startswith("#") for k in node):
            return [listify(node[f"#{i}"]) for i in range(len(node))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True)
    ap.add_argument("--setting", required=True)
    ap.add_argument("--particles", type=int, default=35)
    ap.add_argument("--seed", type=int, default=34114)
    ap.add_argument("--root", default=".")
    ap.add_argument("--suffix", default="", help="run-dir suffix (matches the training --suffix)")
    ap.add_argument("--env_multiplier", type=int, default=1,
                    help="must match the training run for checkpoint export")
    ap.add_argument("--play", default=None, help="npz to evaluate instead")
    ap.add_argument("--episodes", type=int, default=10)
    ap.add_argument("--record", default=None,
                    help="with --play: also roll deterministic episodes and "
                         "write a trajectory npz for tools/view_trajectory.py")
    args = ap.parse_args()

    import jax

    from pfpn_tpu.harness.settings import build
    from pfpn_tpu.harness.build import build_algo

    cfg = build(args.setting, particles=args.particles, env=args.env,
                seed=args.seed, env_multiplier=args.env_multiplier)
    if args.suffix:
        import dataclasses
        cfg = dataclasses.replace(cfg, suffix=args.suffix)
    algo = build_algo(cfg)

    if args.play:
        import jax.numpy as jnp

        data = dict(np.load(args.play))
        params = jax.tree.map(
            lambda x: jnp.asarray(x, jnp.float32),
            unflatten({k[len("params/"):]: v for k, v in data.items()
                       if k.startswith("params/")}))
        norm_flat = {k[len("norm/"):]: v for k, v in data.items()
                     if k.startswith("norm/")}
        norm = algo.net.init_norm()
        norm = norm._replace(**{k: jnp.asarray(v, jnp.float32)
                                for k, v in norm_flat.items()})
        out = jax.jit(lambda p, n, k: algo.evaluate(
            p, n, k, num_episodes=args.episodes))(
                params, norm, jax.random.PRNGKey(0))
        rew = np.asarray(out["reward"])
        frames = np.asarray(out["frames"])
        print(f"[PLAY] {args.play}: reward {rew.mean():.2f} "
              f"(min {rew.min():.2f} max {rew.max():.2f}) "
              f"frames {frames.mean():.0f}")
        if args.record:
            import types

            from pfpn_tpu.harness.eval import rollout_trajectory

            shim = types.SimpleNamespace(params=params, norm=norm)
            pos, quat, done, ret = rollout_trajectory(
                cfg, shim, algo, num_episodes=min(args.episodes, 3))
            tree = getattr(algo.env, "env", algo.env).tree
            np.savez(args.record, link_pos=pos, link_quat=quat, done=done,
                     link_names=np.array(tree.link_names))
            print(f"[PLAY] wrote trajectory to {args.record} "
                  f"(episode rewards {np.round(ret, 1)})")
        return

    from pfpn_tpu.harness.checkpoint import CheckpointManager

    state = algo.init_state(jax.random.PRNGKey(cfg.seed))
    ckpt = CheckpointManager(cfg.checkpoint_dir(args.root))
    step = ckpt.latest_step()
    assert step is not None, f"no checkpoint in {cfg.checkpoint_dir(args.root)}"
    state = ckpt.restore_latest(state)

    blobs = {}
    for k, v in flatten(state.params, "params/").items():
        blobs[k] = v.astype(np.float16) if v.dtype == np.float32 else v
    for f in state.norm._fields:  # NamedTuple
        blobs[f"norm/{f}"] = np.asarray(getattr(state.norm, f))

    os.makedirs("results/policies", exist_ok=True)
    name = (f"results/policies/{args.env}_{cfg.name}"
            f"_particle{args.particles}_{args.seed}_step{step}.npz")
    np.savez_compressed(name, **blobs)
    print(f"exported {name} ({os.path.getsize(name) / 1e6:.1f} MB, "
          f"step {step})")


if __name__ == "__main__":
    main()

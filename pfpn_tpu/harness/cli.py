"""CLI with the reference's flag surface (main.py:14-26).

  python -m pfpn_tpu --env DeepMimicWalk-v0 \\
      --setting deepmimic_dppo_pfpn --particles 35 --seed 34114 --train

Fully-qualified reference setting names ("settings.deepmimic.X") are
accepted and mapped to the preset registry.
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pfpn_tpu")
    p.add_argument("--setting", type=str, required=True)
    p.add_argument("--env", type=str, required=True)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--train", action="store_true", default=False)
    p.add_argument("--debug", action="store_true", default=False)
    p.add_argument("--suffix", type=str, default="")
    p.add_argument("--save_checkpoint_interval", type=int, default=1000)
    p.add_argument("--particles", type=int, default=None)
    p.add_argument("--max_samples", type=int, default=15_000_000)
    p.add_argument("--soft", action="store_true", default=False)
    # TPU scaling beyond reference parity
    p.add_argument("--env_multiplier", type=int, default=1,
                   help="scale parallel envs & minibatch together")
    p.add_argument("--eval_every_rounds", type=int, default=50)
    p.add_argument("--rounds_per_dispatch", type=int, default=1,
                   help="chain this many train rounds per jitted host "
                        "dispatch (amortizes the ~30 ms/call + ~30 ms/"
                        "fetch tunnel overhead; results/TRAIN_PROFILE.md)")
    p.add_argument("--max_rounds", type=int, default=None)
    p.add_argument("--root", type=str, default=".")
    p.add_argument("--stall_timeout", type=float, default=1200.0,
                   help="exit with code 43 when no training round completes "
                        "for this many seconds (hung remote backend); a "
                        "supervisor restart resumes from the checkpoint. "
                        "0 disables. Must exceed first-round compile time.")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    # multi-host DCN: join the jax.distributed cluster first when the
    # coordinator env vars are present (no-op single-host; must run before
    # any backend use so jax.devices() spans the slice)
    from ..distributed.mesh import init_distributed
    if init_distributed():
        import jax
        print(f"[SYSTEM] joined jax.distributed cluster: "
              f"process {jax.process_index()}/{jax.process_count()}, "
              f"{len(jax.devices())} global devices", flush=True)
    from .settings import build
    import dataclasses

    cfg = build(
        args.setting, particles=args.particles, env=args.env,
        seed=args.seed, max_samples=args.max_samples, soft=args.soft,
        env_multiplier=args.env_multiplier,
    )
    cfg = dataclasses.replace(
        cfg, save_checkpoint_interval=args.save_checkpoint_interval,
        suffix=args.suffix,
    )

    if args.train:
        banner = {
            "env": cfg.env, "setting": cfg.name, "algo": cfg.algo,
            "head": cfg.head, "workers": cfg.workers,
            "num_envs": cfg.num_envs, "minibatch": cfg.minibatch_size,
            "max_samples": cfg.max_samples, "seed": cfg.seed,
            "checkpoint_dir": cfg.checkpoint_dir(args.root),
        }
        print("#" * 80)
        for k, v in banner.items():
            print(f"{k}: {v}")
        print("#" * 80, flush=True)
        from .train import train
        train(cfg, root=args.root,
              eval_every_rounds=args.eval_every_rounds,
              max_rounds=args.max_rounds, debug=args.debug,
              stall_timeout_s=args.stall_timeout,
              rounds_per_dispatch=args.rounds_per_dispatch)
    else:
        from .eval import visualize
        visualize(cfg, root=args.root)


if __name__ == "__main__":
    main()

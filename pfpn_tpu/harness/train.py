"""Training driver: jitted rounds, interleaved evaluation, checkpointing.

Rebuild of the reference's process orchestration (DistributedModel.train +
the evaluator process, distributed_model.py:430-545): the worker farm is the
vmapped env batch inside one jitted round; the polling evaluator process
becomes interleaved deterministic-policy evaluation on the same chip.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..distributed.mesh import default_mesh, shard_state
from .build import build_algo
from .checkpoint import CheckpointManager
from .config import RunConfig
from .metrics import MetricsLogger
from .watchdog import Watchdog


def train(cfg: RunConfig, root: str = ".",
          eval_every_rounds: int = 50, eval_episodes: int = 10,
          max_rounds: Optional[int] = None, verbose: bool = True,
          debug: bool = False, stall_timeout_s: float = 0.0,
          rounds_per_dispatch: int = 1):
    """Train to cfg.max_samples; resume from the latest checkpoint if any.

    Uses every visible device: with >1 device the state is placed on a
    data-parallel mesh (env batch sharded, params replicated — GSPMD inserts
    the gradient all-reduce over ICI), replacing the reference's
    SyncReplicasOptimizer aggregation (sync_model.py:92-95).

    stall_timeout_s > 0 arms a watchdog that exits the process with
    watchdog.STALL_EXIT_CODE when no training round completes within the
    timeout (hung remote backend) — a supervisor restart resumes from the
    latest checkpoint. Must exceed the first-round compile time.

    rounds_per_dispatch > 1 chains that many train rounds in one jitted
    lax.scan per host dispatch. The remote tunnel costs ~30 ms per jitted
    call plus ~30 ms per fetched leaf (results/TRAIN_PROFILE.md: 153 ms
    host overhead per round at mult8 = 23% of the round); batching rounds
    amortizes it. Metrics for every chained round are still logged
    individually, evaluation triggers on each eval_every_rounds boundary
    crossing, and the sample-count stop overshoots by at most
    rounds_per_dispatch - 1 rounds.
    """
    # arm the watchdog BEFORE any device work: startup itself runs device
    # programs (reference-table FK in build_algo, init_state, checkpoint
    # restore) and a relaunch after a stall can hit a still-dead tunnel
    # right here — without the watchdog the retrying supervisor would hang
    # forever instead of getting another exit-43 round
    wd = Watchdog(stall_timeout_s)
    # startup (build_algo's reference-table device programs, init_state,
    # restore) contains single device steps that can exceed a
    # steady-state-tuned timeout on a cold remote-compile cache — give
    # the whole startup the same one-off window as the first compile
    wd.grace(max(stall_timeout_s, 1800.0))

    # NOTE: no beats between startup steps — a beat would shrink the
    # window back to the steady-state timeout mid-startup
    algo = build_algo(cfg)
    key = jax.random.PRNGKey(cfg.seed)
    state = algo.init_state(key)

    ckpt = CheckpointManager(cfg.checkpoint_dir(root))
    restored = ckpt.restore_latest(state)
    if restored is not None:
        state = restored
        if verbose:
            print(f"[SYSTEM] resumed from step {ckpt.latest_step()}", flush=True)

    n_dev = len(jax.devices())
    num_envs = getattr(algo.cfg, "num_envs", 1)
    if n_dev > 1 and num_envs % n_dev == 0:
        mesh = default_mesh()
        state = shard_state(state, mesh)
        if verbose:
            print(f"[SYSTEM] data-parallel mesh over {n_dev} devices "
                  f"({num_envs // n_dev} envs/device)", flush=True)

    # --debug lifts the 10 s console throttle (reference `--debug all`
    # enables logging beyond the chief, distributed_model.py:587 — here the
    # analog is per-round instead of per-10 s console output)
    logger = MetricsLogger(cfg.log_dir(root),
                           console_interval=0.0 if debug else 10.0)
    # Pack the metrics dict into two stacked vectors inside the jitted
    # program: every np.asarray(scalar) is its own ~30 ms tunnel round
    # trip, so the per-leaf dict fetch dominated host overhead
    # (results/TRAIN_PROFILE.md). Ints (global_step/total_samples) stay
    # int32 — exact where a float32 cast would round above 2^24.
    # tracing the round for its metric schema is host-side Python — slow
    # on a contended single-core host — and the first dispatch right after
    # adds the full XLA compile: widen the stall window for both one-offs
    wd.grace(max(stall_timeout_s, 1800.0))
    mshapes = jax.eval_shape(algo.train_round, state)[1]
    ikeys = tuple(k for k in sorted(mshapes)
                  if np.issubdtype(mshapes[k].dtype, np.integer))
    fkeys = tuple(k for k in sorted(mshapes) if k not in ikeys)
    R = max(1, int(rounds_per_dispatch))

    def _dispatch(st):
        def body(c, _):
            c, m = algo.train_round(c)
            fvec = jnp.stack([m[k].astype(jnp.float32) for k in fkeys])
            ivec = jnp.stack([m[k].astype(jnp.int32) for k in ikeys])
            return c, (fvec, ivec)
        st, (fv, iv) = jax.lax.scan(body, st, None, length=R)
        return st, fv, iv

    train_round_n = jax.jit(_dispatch)
    evaluate = jax.jit(
        lambda p, n, k: algo.evaluate(p, n, k, num_episodes=eval_episodes)
    )

    eval_key = jax.random.PRNGKey(cfg.seed + 12345)
    round_idx = 0
    eval_reward_sum, eval_reward_n = 0.0, 0  # performance_test/reward_avg
    # (running average over all eval episodes, distributed_model.py:247-252)
    last_ckpt_step = int(state.global_step)
    t_start = time.time()

    while int(state.total_samples) < cfg.max_samples:
        if max_rounds is not None and round_idx >= max_rounds:
            break
        if round_idx == 0:
            # the first dispatch includes the full train-round XLA compile
            # (10+ min for the big replay-buffer presets over the remote
            # compiler) — give it a wide one-off window so a steady-state
            # stall_timeout_s does not 43-loop on a healthy compile
            wd.grace(max(stall_timeout_s, 1800.0))
        state, fv, iv = train_round_n(state)
        fv, iv = np.asarray(fv), np.asarray(iv)   # 2 fetches per dispatch
        wd.beat()  # host fetch completed -> the backend is alive
        for r in range(R):
            metrics = {k: fv[r, i] for i, k in enumerate(fkeys)}
            metrics.update({k: iv[r, i] for i, k in enumerate(ikeys)})
            step = int(metrics["global_step"])
            logger.log(step, metrics, prefix="train/")
            if verbose:
                logger.console("TRAIN", step, {
                    "samples": metrics["total_samples"],
                    "loss": metrics["loss"],
                    "ep_reward": metrics["episode_reward"],
                    "sps": float(metrics["total_samples"]) / max(time.time() - t_start, 1e-9),
                })

        crossed = (eval_every_rounds
                   and (round_idx + R) // eval_every_rounds
                   > round_idx // eval_every_rounds)
        round_idx += R
        if crossed:
            eval_key, k = jax.random.split(eval_key)
            # the first evaluate() is a fresh multi-minute XLA compile —
            # widen the window instead of only resetting it, so an
            # aggressive steady-state timeout survives the compile
            wd.grace(max(stall_timeout_s, 900.0))
            try:
                out = evaluate(state.params, state.norm, k)
            except Exception as e:  # transient backend errors must not kill training
                # NOTE: must fall through — the checkpoint block below still
                # has to run on this round (a flaky evaluator must not starve
                # checkpoints on a flaky tunnel; tests/test_harness.py)
                print(f"[SYSTEM] evaluator failed ({type(e).__name__}); skipping",
                      flush=True)
                out = None
            if out is not None:
                rew = np.asarray(out["reward"])
                frames = np.asarray(out["frames"])
                eval_reward_sum += float(rew.sum())
                eval_reward_n += rew.size
                reward_avg = eval_reward_sum / eval_reward_n
                logger.log(step, {
                    "reward": rew.mean(), "reward_avg": reward_avg,
                    "reward_max": rew.max(),
                    "reward_min": rew.min(), "frames": frames.mean(),
                    "samples": float(state.total_samples),
                }, prefix="performance_test/")
                if verbose:
                    print(f"[PERFORM] step {step} reward {rew.mean():.2f} "
                          f"(avg {reward_avg:.2f} min {rew.min():.2f} "
                          f"max {rew.max():.2f}) "
                          f"frames {frames.mean():.0f}", flush=True)
                # per-dimension particle/action histograms (reference
                # a2c.py:336-344 via models/utils.py:17-31)
                hists = {}
                head = (state.params.get("head", {})
                        if isinstance(state.params, dict) else {})
                if "particles" in head:
                    hists["particle/loc"] = np.asarray(head["particles"])
                    ls = head.get("particles_log_std",
                                  head.get("particles_log_std_fixed"))
                    if ls is not None:
                        hists["particle/std"] = np.exp(np.asarray(ls))
                try:
                    hists["action"] = np.asarray(algo.net.act_deterministic(
                        state.params, state.norm, state.obs))
                except Exception:
                    pass
                if hists:
                    logger.log_histograms(step, hists, prefix="train/")

        if step - last_ckpt_step >= cfg.save_checkpoint_interval:
            ckpt.save(step, state)
            last_ckpt_step = step
            wd.beat()

    # keep the watchdog armed through the final save (it device_gets the
    # state and can hang like any fetch); a post-stall retry re-enters with
    # samples already reached and lands back here immediately
    ckpt.save(int(state.global_step), state)
    wd.stop()
    logger.close()
    ckpt.close()
    return state

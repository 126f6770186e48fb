"""Declarative run configuration (rebuild of the reference settings system).

The reference composes configs from import-time-mutated module dicts
(settings/deepmimic/*.py + main.py:30-58, SURVEY.md §5 "Config / flag
system"). Here the same three axes — algorithm x policy-head x env — are a
frozen dataclass tree, and the derived-quantity rules (max_iterations,
resample-interval formulas) are explicit functions.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional


@dataclasses.dataclass(frozen=True)
class HeadSettings:
    kind: str = "particle"            # "particle" | "gaussian" | "discrete"
    particles: Optional[int] = 35     # per action dimension
    init_sigma: Optional[float] = None
    fixed_sigma: bool = False
    resample: int = -1
    resample_interval: int = 2000
    resample_threshold: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class NetworkSettings:
    """network_opts parity (settings/deepmimic/deepmimic_base.py:3-24)."""

    common_shape: tuple = ()
    actor_shape: tuple = (1024, 512)
    critic_shape: tuple = (1024, 512)
    # LSTM common trunk (episodic/sequence training, ops.py:11-37); the
    # hidden size, or None for the feedforward trunks above
    lstm: Optional[int] = None
    gamma: float = 0.95
    lambd: float = 0.95
    value_loss_coef: float = 0.5
    normalize_state: bool = True
    clip_state: Optional[float] = 5.0
    normalize_value: bool = False     # deepmimic_base.py:14 (off everywhere)
    clip_value: Optional[float] = None
    normalize_advantage: bool = False
    clip_advantage: Optional[float] = None
    entropy_beta: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class WorkerSettings:
    """worker_opts parity."""

    lr_critic: float = 1e-4
    lr_actor: float = 5e-6
    norm_clip: Optional[float] = 1.0
    opt_epochs: Optional[int] = 1
    batch_size: int = 32              # per-worker minibatch (reference units)
    unroll_length: int = 512
    buffer_capacity: int = 1_000_000  # off-policy replay
    observations: int = 0             # random warmup steps (SAC)


@dataclasses.dataclass(frozen=True)
class RunConfig:
    name: str
    algo: str                         # "ppo" | "a2c" | "vtrace" | "sac" | "ddpg"
    head: HeadSettings
    network: NetworkSettings
    worker: WorkerSettings
    workers: int = 8                  # reference worker count == parallel envs
    env: str = "DeepMimicWalk-v0"
    seed: int = 1
    max_samples: int = 15_000_000
    save_checkpoint_interval: int = 1000   # optimizer steps (main.py:23)
    # run-dir suffix (reference main.py:45-53: "_<suffix>" appended after
    # the particle tag)
    suffix: str = ""
    # TPU scaling knobs (beyond reference parity)
    env_multiplier: int = 1           # scale envs & minibatch together

    @property
    def num_envs(self) -> int:
        return self.workers * self.env_multiplier

    @property
    def minibatch_size(self) -> int:
        """Reference: SyncReplicasOptimizer aggregates `workers` gradients of
        `batch_size` samples each -> effective minibatch workers*batch."""
        return self.worker.batch_size * self.workers * self.env_multiplier

    def _dir_suffix(self) -> str:
        suffix = ""
        if self.head.kind in ("particle", "discrete") and self.head.particles:
            suffix = f"_particle{self.head.particles}"
        if self.suffix:
            suffix += f"_{self.suffix}"
        return suffix

    def checkpoint_dir(self, root: str = ".") -> str:
        return f"{root}/ckpt_{self.env}/{self.name}{self._dir_suffix()}/{self.seed}"

    def log_dir(self, root: str = ".") -> str:
        return f"{root}/log_{self.env}/{self.name}{self._dir_suffix()}/{self.seed}"


# ---------------------------------------------------------------------------
# derived-quantity rules (made explicit; reference computes them at import
# time from sys.argv)
# ---------------------------------------------------------------------------

def dppo_pfpn_resample_interval(worker: WorkerSettings, soft: bool = False) -> int:
    """settings/deepmimic/deepmimic_dppo_pfpn.py:9-17: ~20 episodes of 600
    steps converted to optimizer iterations."""
    resample_every_episodes = 20
    episode_length = 600
    iterations_per_roll = (
        worker.unroll_length / worker.batch_size * (worker.opt_epochs or 1)
    )
    rolls = round(episode_length * resample_every_episodes / worker.unroll_length)
    if soft:
        return int(rolls * worker.unroll_length)
    return int(rolls * iterations_per_roll)


def max_iterations_dppo(max_samples: int, worker: WorkerSettings, workers: int) -> int:
    """deepmimic_dppo_base.py:14-16."""
    rounds = math.ceil(max_samples / (worker.unroll_length * workers))
    return int(rounds * worker.unroll_length / worker.batch_size * (worker.opt_epochs or 1))

"""Named run presets — parity registry for the reference's settings modules.

Every `--setting` the reference accepts (settings/deepmimic/*.py) has an
entry here with the same hyperparameters; the import-time sys.argv hacks
(--particles / --max_samples / --soft) become explicit arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from .config import (
    HeadSettings, NetworkSettings, RunConfig, WorkerSettings,
    dppo_pfpn_resample_interval,
)

# base network opts (deepmimic_base.py:3-24)
_BASE_NET = NetworkSettings()
_BASE_WORKER = WorkerSettings()


def _dppo_worker():
    # deepmimic_dppo_base.py:6-11
    return dataclasses.replace(
        _BASE_WORKER, norm_clip=1.0, opt_epochs=1, batch_size=32,
        unroll_length=512,
    )


def _a3c_worker():
    # deepmimic_a3c_base.py:6-12
    return dataclasses.replace(
        _BASE_WORKER, norm_clip=0.5, opt_epochs=1, batch_size=32,
        unroll_length=32,
    )


def _impala_worker():
    # deepmimic_impala_base.py:6-12
    return dataclasses.replace(
        _BASE_WORKER, norm_clip=0.5, opt_epochs=1, batch_size=4,
        unroll_length=64,
    )


def _sac_worker():
    # deepmimic_sac_base.py:4-13
    return dataclasses.replace(
        _BASE_WORKER, norm_clip=1.0, opt_epochs=None, batch_size=256,
        unroll_length=1, buffer_capacity=1_000_000, observations=0,
    )


def build(setting: str, particles: Optional[int] = None,
          env: str = "DeepMimicWalk-v0", seed: int = 1,
          max_samples: int = 15_000_000, soft: bool = False,
          env_multiplier: int = 1) -> RunConfig:
    """Build a RunConfig for a reference setting name."""
    name = setting.split(".")[-1]

    if name == "deepmimic_dppo_pfpn":
        worker = dataclasses.replace(_dppo_worker(), lr_actor=1e-4)
        head = HeadSettings(
            kind="particle", particles=particles or 35, resample=-1,
            resample_interval=dppo_pfpn_resample_interval(worker, soft),
        )
        net = dataclasses.replace(_BASE_NET, normalize_advantage=True)
        return RunConfig(name=name, algo="ppo", head=head, network=net,
                         worker=worker, workers=8, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_dppo_gauss":
        worker = _dppo_worker()  # lr_actor stays 5e-6 (deepmimic_base.py)
        head = HeadSettings(kind="gaussian", particles=None, init_sigma=0.05)
        net = dataclasses.replace(_BASE_NET, normalize_advantage=True)
        return RunConfig(name=name, algo="ppo", head=head, network=net,
                         worker=worker, workers=8, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_dppo_dis":
        worker = dataclasses.replace(_dppo_worker(), lr_actor=1e-4)
        head = HeadSettings(kind="discrete", particles=particles or 35)
        net = dataclasses.replace(_BASE_NET, normalize_advantage=True)
        return RunConfig(name=name, algo="ppo", head=head, network=net,
                         worker=worker, workers=8, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_a3c_pfpn":
        worker = dataclasses.replace(_a3c_worker(), lr_actor=1e-4)
        head = HeadSettings(
            kind="particle", particles=particles or 35, resample=-1,
            # deepmimic_a3c_pfpn.py:7: 12000 * workers / batch_size
            resample_interval=int(12000 * 16 / 32),
        )
        net = dataclasses.replace(_BASE_NET, entropy_beta=2.5e-4)
        return RunConfig(name=name, algo="a2c", head=head, network=net,
                         worker=worker, workers=16, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_a3c_gauss":
        worker = _a3c_worker()
        head = HeadSettings(kind="gaussian", particles=None)
        net = dataclasses.replace(_BASE_NET, entropy_beta=2.5e-4)
        return RunConfig(name=name, algo="a2c", head=head, network=net,
                         worker=worker, workers=16, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_a3c_dis":
        worker = dataclasses.replace(_a3c_worker(), lr_actor=1e-4)
        head = HeadSettings(kind="discrete", particles=particles or 35)
        net = dataclasses.replace(_BASE_NET, entropy_beta=2.5e-4)
        return RunConfig(name=name, algo="a2c", head=head, network=net,
                         worker=worker, workers=16, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_impala_pfpn":
        worker = dataclasses.replace(_impala_worker(), lr_actor=1e-4)
        head = HeadSettings(
            kind="particle", particles=particles or 35, resample=-1,
            # deepmimic_impala_pfpn.py:7: 12000*workers/batch/unroll
            resample_interval=int(12000 * 32 / 4 / 64),
        )
        net = dataclasses.replace(_BASE_NET, entropy_beta=2.5e-4)
        return RunConfig(name=name, algo="vtrace", head=head, network=net,
                         worker=worker, workers=32, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_impala_gauss":
        worker = _impala_worker()
        head = HeadSettings(kind="gaussian", particles=None)
        net = dataclasses.replace(_BASE_NET, entropy_beta=2.5e-4)
        return RunConfig(name=name, algo="vtrace", head=head, network=net,
                         worker=worker, workers=32, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_impala_dis":
        worker = dataclasses.replace(_impala_worker(), lr_actor=1e-4)
        head = HeadSettings(kind="discrete", particles=particles or 35)
        net = dataclasses.replace(_BASE_NET, entropy_beta=2.5e-4)
        return RunConfig(name=name, algo="vtrace", head=head, network=net,
                         worker=worker, workers=32, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_sac_pfpn":
        worker = dataclasses.replace(_sac_worker(), lr_actor=1e-4)
        head = HeadSettings(
            kind="particle", particles=particles or 35, resample=-1,
            resample_interval=12000,  # deepmimic_sac_pfpn.py:6
        )
        return RunConfig(name=name, algo="sac", head=head, network=_BASE_NET,
                         worker=worker, workers=1, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_sac_gauss":
        worker = _sac_worker()
        head = HeadSettings(kind="gaussian", particles=None)
        return RunConfig(name=name, algo="sac", head=head, network=_BASE_NET,
                         worker=worker, workers=1, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_ddpg_gauss":
        worker = _sac_worker()
        head = HeadSettings(kind="gaussian", particles=None)
        return RunConfig(name=name, algo="ddpg", head=head, network=_BASE_NET,
                         worker=worker, workers=1, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    if name == "deepmimic_ddpg_pfpn":
        worker = dataclasses.replace(_sac_worker(), lr_actor=1e-4)
        head = HeadSettings(kind="particle", particles=particles or 35,
                            resample=-1, resample_interval=12000)
        return RunConfig(name=name, algo="ddpg", head=head, network=_BASE_NET,
                         worker=worker, workers=1, env=env, seed=seed,
                         max_samples=max_samples, env_multiplier=env_multiplier)

    raise KeyError(f"unknown setting: {setting}")


SETTINGS = [
    "deepmimic_dppo_pfpn", "deepmimic_dppo_gauss", "deepmimic_dppo_dis",
    "deepmimic_a3c_pfpn", "deepmimic_a3c_gauss", "deepmimic_a3c_dis",
    "deepmimic_impala_pfpn", "deepmimic_impala_gauss", "deepmimic_impala_dis",
    "deepmimic_sac_pfpn", "deepmimic_sac_gauss",
    "deepmimic_ddpg_pfpn", "deepmimic_ddpg_gauss",
]

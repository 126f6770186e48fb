"""Device-mesh data-parallel training (pjit/GSPMD).

TPU-native replacement for the reference's TF1 gRPC cluster (SURVEY.md §2.3):
parameter servers and SyncReplicasOptimizer token queues become GSPMD — env
states shard over the mesh's data axis, parameters/optimizer state replicate,
and XLA inserts the gradient all-reduce (psum over ICI) automatically when a
replicated-output gradient is computed from sharded inputs.

Works identically on real multi-chip meshes and on the virtual CPU mesh used
by tests (XLA_FLAGS=--xla_force_host_platform_device_count=N — the same
"cluster emulation on one machine" trick as the reference's localhost
multiprocess setup, SURVEY.md §4).
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _ppo_state_shardings(ppo, state, mesh: Mesh):
    """Env-batch leaves shard over 'data'; everything else replicates."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    num_envs = ppo.cfg.num_envs

    env_leaves = set(id(x) for x in jax.tree.leaves(state.env_state))

    def spec(leaf):
        if id(leaf) in env_leaves:
            return data
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == num_envs:
            return data
        return repl

    return jax.tree.map(spec, state)


def make_sharded_ppo(ppo, mesh: Mesh, key):
    """Returns (sharded_state, jitted_train_round) for a PPO/A2C/V-trace
    instance on the given mesh. num_envs must divide the data-axis size."""
    assert ppo.cfg.num_envs % mesh.shape["data"] == 0, (
        f"num_envs={ppo.cfg.num_envs} not divisible by mesh "
        f"data axis {mesh.shape['data']}"
    )
    state = ppo.init_state(key)
    shardings = _ppo_state_shardings(ppo, state, mesh)
    state = jax.device_put(state, shardings)
    train_round = jax.jit(ppo.train_round, donate_argnums=0)
    return state, train_round


def default_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))

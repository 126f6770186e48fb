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

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Per-env state lives in these PPOState/SACState fields (leading axis =
# num_envs); everything else — params, optimizer state, normalizer, head
# stats, RNG key, counters — replicates. Selection is by *pytree path*
# (field name), never by shape: a parameter whose first dimension happens
# to equal num_envs (e.g. a 512-wide trunk with 512 envs) must still
# replicate, or the implicit gradient psum silently breaks.
# `carry` is the per-env LSTM (c, h) of the recurrent path (None elsewhere;
# an empty subtree shards trivially).
DATA_FIELDS = frozenset(
    {"env_state", "obs", "ep_return", "last_ep_return", "carry",
     "ou_state"})


def state_shardings(state, mesh: Mesh):
    """Sharding pytree for an algo state: DATA_FIELDS shard over 'data',
    everything else replicates. Matches `state`'s structure leaf-for-leaf."""
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    out = {}
    for f in dataclasses.fields(state):
        sub = getattr(state, f.name)
        spec = data if f.name in DATA_FIELDS else repl
        out[f.name] = jax.tree.map(lambda _: spec, sub)
    return state.replace(**out)


def shard_state(state, mesh: Mesh):
    """Place an (unsharded or host) algo state onto the mesh."""
    return jax.device_put(state, state_shardings(state, mesh))


def make_sharded(algo, mesh: Mesh, key, donate: bool = True):
    """Returns (sharded_state, jitted_train_round) for any algo family on
    the given mesh — PPO/A2C/V-trace (PPOState) and SAC/DDPG (SACState)
    share the contract: ``cfg.num_envs``, ``init_state(key)``,
    ``train_round(state)``. Per-env fields (DATA_FIELDS) shard over the
    data axis; params/optimizer/normalizer — and, for off-policy, the
    replay ring (reference ddpg.py:11-27's host buffer) — replicate, so
    every device samples identical minibatches from its replica and the
    gradient all-reduce is the only cross-device traffic XLA must insert.
    num_envs must divide the data-axis size."""
    assert algo.cfg.num_envs % mesh.shape["data"] == 0, (
        f"num_envs={algo.cfg.num_envs} not divisible by mesh "
        f"data axis {mesh.shape['data']}"
    )
    state = shard_state(algo.init_state(key), mesh)
    train_round = jax.jit(
        algo.train_round, donate_argnums=(0,) if donate else ()
    )
    return state, train_round


# historical name (round-2/3 tests and docs); the helper was never
# PPO-specific beyond its name
make_sharded_ppo = make_sharded


def default_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def init_distributed() -> bool:
    """Multi-host (DCN) entry: join the jax.distributed cluster when the
    standard coordinator env vars are present, so `jax.devices()` spans all
    hosts and `default_mesh()` becomes a global data mesh.

    Replaces the reference's gRPC ClusterSpec/Server formation
    (distributed_model.py:552-554) the JAX way: call once per host before
    any backend use; afterwards the existing GSPMD path works unchanged —
    the data axis shards over every chip in the slice, gradient all-reduce
    rides ICI within a host and DCN across hosts (SURVEY.md §5
    "distributed communication backend").

    Reads (either naming scheme):
      JAX_COORDINATOR_ADDRESS / COORDINATOR_ADDRESS  host:port of process 0
      JAX_NUM_PROCESSES / NUM_PROCESSES              world size
      JAX_PROCESS_ID / PROCESS_ID                    this host's rank

    Returns True if the cluster was joined, False when the env vars are
    absent (single-host: the normal case on this rig). Exercised by
    tests/test_algos.py: a 1-process cluster, and a genuine 2-process
    cluster whose 8-device global mesh runs a full sharded PPO train
    round with the gradient all-reduce crossing the process boundary
    (Gloo — the CPU analog of DCN). Real multi-host TPU hardware is not
    available on this rig.
    """
    import os

    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if not addr:
        return False
    # empty-string env vars mean "unset" (the convention templated env
    # files and this repo's own PALLAS_AXON_POOL_IPS= use)
    nproc = (os.environ.get("JAX_NUM_PROCESSES")
             or os.environ.get("NUM_PROCESSES"))
    pid = os.environ.get("JAX_PROCESS_ID") or os.environ.get("PROCESS_ID")
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=int(nproc) if nproc else None,
        process_id=int(pid) if pid else None,
    )
    return True

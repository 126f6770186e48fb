"""PFPN-TPU: a TPU-native (JAX/XLA/Pallas) rebuild of the PFPN framework.

Particle Filtering Policy Networks for physics-based character control
(reference: xupei0610/PFPN, Xu & Karamouzas MIG'21), re-designed TPU-first:
the physics simulation, imitation reward, normalizers, GAE, policy heads and
optimizer updates all fuse into one jitted program, vmapped over thousands of
humanoids and sharded over device meshes with ICI collectives.

Subpackages:
  math           quaternion / SO(3) algebra, filters
  sim            batched reduced-coordinate rigid-body physics (Featherstone)
  control        Stable-PD controller
  mocap          DeepMimic motion capture loading + phase-indexed queries
  envs           DeepMimic imitation tasks as pure JAX functions
  distributions  Gaussian / categorical / particle-filtering policy heads
  networks       MLP trunks, normalizers, actor-critic assembly, resampling
  algos          PPO / A2C / V-trace / SAC / DDPG + GAE and replay
  distributed    device-mesh training (pjit / shard_map / psum)
  harness        config system, train loop, checkpointing, metrics, CLI
"""

__version__ = "0.1.0"

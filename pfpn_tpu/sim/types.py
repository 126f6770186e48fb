"""Static kinematic-tree description and dynamic simulation state.

The reference delegates articulated rigid-body dynamics to Bullet's C++
``btMultiBody`` (reduced coordinates, see /root/reference/envs/bullet_env.py).
Here the same capability is a pure-JAX data model:

* :class:`KinematicTree` — host-side, NumPy, fixed at load time. It is
  *closed over* by jitted functions, so all its arrays become XLA constants
  (no dynamic shapes, fully fusable).
* :class:`SimState` — a JAX pytree of device arrays, one set per environment;
  every field carries an optional leading batch dimension via ``vmap``.

Joint model (matching Bullet's btMultiBody joint types used by the humanoid):
  free       6 dof — floating base (body 0 only)
  spherical  3 dof — quaternion position coordinate, local angular velocity
  revolute   1 dof — scalar angle about a fixed local axis

Fixed URDF joints are merged into their parent movable body at load time
(dynamics-equivalent); the original URDF link set is preserved in the
``link_*`` reporting tables because observations/rewards address Bullet link
indices (reference deepmimic.py:555-592, 594-753).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np
from flax import struct

FREE = 0
SPHERICAL = 1
REVOLUTE = 2
FIXED_BASE = 3  # zero-dof base (PyBullet useFixedBase)

# Contact geometry types
GEOM_SPHERE = 0
GEOM_CAPSULE = 1
GEOM_BOX = 2


@dataclasses.dataclass(frozen=True)
class Geom:
    """A collision geometry attached to a movable body (body frame coords)."""

    body: int                 # movable body index
    kind: int                 # GEOM_*
    pos: Tuple[float, ...]    # offset of geom origin in body frame
    quat: Tuple[float, ...]   # orientation of geom in body frame (xyzw)
    size: Tuple[float, ...]   # sphere: (r,), capsule: (r, half_len), box: half extents
    link: int                 # owning reference link index (for contact filtering)


@dataclasses.dataclass(frozen=True)
class KinematicTree:
    """Static articulated-body description (host side, NumPy)."""

    # --- movable bodies (index 0 = floating base) ---
    nb: int
    parent: np.ndarray            # (nb,) int, parent body index; -1 for base
    joint_type: Tuple[int, ...]   # (nb,) FREE/SPHERICAL/REVOLUTE per body
    joint_pos: np.ndarray         # (nb, 3) joint origin in parent body frame
    joint_quat: np.ndarray        # (nb, 4) static joint-frame rotation (xyzw)
    joint_axis: np.ndarray        # (nb, 3) revolute axis in body frame
    body_names: Tuple[str, ...]

    # spatial inertia (6x6) of each body about its frame origin, body coords
    spatial_inertia: np.ndarray   # (nb, 6, 6)
    mass: np.ndarray              # (nb,)
    com: np.ndarray               # (nb, 3) CoM offset in body frame

    # --- dof bookkeeping ---
    ndof: int
    dof_offset: np.ndarray        # (nb,) first dof index of body's joint
    dof_count: np.ndarray         # (nb,)
    # indices of each body's joint into the typed state arrays
    sph_index: np.ndarray         # (nb,) index into q_sph/w_sph or -1
    rev_index: np.ndarray         # (nb,) index into q_rev/w_rev or -1
    n_sph: int
    n_rev: int

    # --- reference-link reporting (Bullet link semantics) ---
    # For each of the original URDF links (in joint declaration order):
    link_names: Tuple[str, ...]
    link_body: np.ndarray         # (nl,) movable body owning the link
    link_pos: np.ndarray          # (nl, 3) body frame -> link (joint) frame
    link_quat: np.ndarray         # (nl, 4)
    link_inertial_pos: np.ndarray   # (nl, 3) link frame -> CoM frame
    link_inertial_quat: np.ndarray  # (nl, 4)
    link_mass: np.ndarray         # (nl,)
    link_parent: np.ndarray       # (nl,) parent link index (-1 = base)

    # --- motors (revolute + spherical joints, in joint order) ---
    motor_bodies: Tuple[int, ...]      # movable body index per motor
    motor_names: Tuple[str, ...]
    motor_is_spherical: Tuple[bool, ...]
    motor_torque_limit: np.ndarray     # (n_motors,)
    motor_movement_limit: np.ndarray   # (n_motors, 2) lower/upper

    # --- contact geoms ---
    geoms: Tuple[Geom, ...]

    def body_index(self, name: str) -> int:
        return self.body_names.index(name)

    def link_index(self, name: str) -> int:
        return self.link_names.index(name)


@struct.dataclass
class SimState:
    """Dynamic state of one articulated body (pytree of device arrays).

    Base velocities are world-frame (matching Bullet's getBaseVelocity);
    joint velocities are local/child-frame (matching getJointStateMultiDof).
    """

    base_pos: "jax.Array"    # (3,)
    base_quat: "jax.Array"   # (4,) xyzw
    base_lin: "jax.Array"    # (3,) world-frame linear velocity of base origin
    base_ang: "jax.Array"    # (3,) world-frame angular velocity
    q_sph: "jax.Array"       # (n_sph, 4) local joint quaternions
    w_sph: "jax.Array"       # (n_sph, 3) local-frame angular velocities
    q_rev: "jax.Array"       # (n_rev,) angles
    w_rev: "jax.Array"       # (n_rev,) angular rates


def zero_state(tree: KinematicTree) -> SimState:
    import jax.numpy as jnp

    ident = jnp.zeros((tree.n_sph, 4)).at[:, 3].set(1.0)
    return SimState(
        base_pos=jnp.zeros(3),
        base_quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        base_lin=jnp.zeros(3),
        base_ang=jnp.zeros(3),
        q_sph=ident,
        w_sph=jnp.zeros((tree.n_sph, 3)),
        q_rev=jnp.zeros(tree.n_rev),
        w_rev=jnp.zeros(tree.n_rev),
    )

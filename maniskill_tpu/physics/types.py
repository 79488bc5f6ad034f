"""Core physics types: static ``Model`` and dynamic ``Data`` pytrees.

This is the TPU-native replacement for the reference's native sim backend
(SAPIEN/PhysX, see SURVEY.md §2.1-2.2). Instead of a C++ engine with an
apply/fetch CUDA-buffer protocol, simulation state is a pytree of jax arrays
with a leading env axis; the stepper is a pure function ``(Model, Data) ->
Data`` that XLA compiles end-to-end (optionally sharded over a device mesh on
the env axis).

Design notes:
- Reduced coordinates everywhere (MJX-style): every simulated body hangs off a
  kinematic forest via exactly one joint (FREE / HINGE / SLIDE / FIXED). Free
  rigid actors are FREE-jointed bodies; articulations are subtrees.
- ``Model`` topology (parents, joint types, addresses) is stored as *numpy*
  arrays (static at trace time — python loops over bodies unroll in jit).
  Physical parameters (masses, sizes, gains, friction) are jax arrays and may
  optionally carry a leading env axis for per-env heterogeneity (the TPU-native
  equivalent of the reference's ``Actor.merge`` heterogeneous simulation,
  mani_skill/utils/structs/actor.py:99-126).
- All dynamic state in ``Data`` is batched: leading axis = num_envs.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


# Joint types
FREE = 0
HINGE = 1
SLIDE = 2
FIXED = 3

JOINT_NQ = {FREE: 7, HINGE: 1, SLIDE: 1, FIXED: 0}
JOINT_NV = {FREE: 6, HINGE: 1, SLIDE: 1, FIXED: 0}

# Geom types
PLANE = 0
SPHERE = 1
BOX = 2
CAPSULE = 3
CYLINDER = 4
MESH = 5  # visual-only (collision uses fitted primitives or convex hulls)
HULL = 6  # convex hull proxy: vertex cloud in Model.hull_verts (collision)

# Body dynamic types (mirrors reference build_dynamic/kinematic/static,
# mani_skill/utils/building/actor_builder.py:193-261)
DYNAMIC = 0
KINEMATIC = 1
STATIC = 2


def f32_matmuls(fn):
    """Trace ``fn`` with f32-accurate matmuls.

    TPU default matmul precision feeds the MXU bf16 operands (~2^-8 relative
    error), which is unacceptable for the dynamics spine: forces and
    integrated velocities would quantize per substep. Hot paths that tolerate
    bf16 (the solver inner iteration, the rasterizer shading gather) opt back
    in explicitly by casting operands to bfloat16.
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped


class HArray:
    """Immutable, hashable numpy array for static (non-pytree) Model fields.

    jit dispatch hashes/compares treedefs, so static fields must implement
    ``__hash__``/``__eq__``; plain numpy arrays don't. ``__eq__`` against
    another HArray returns a bool (for treedef comparison); against anything
    else it delegates to numpy elementwise semantics so physics code can use
    these fields as ordinary arrays.
    """

    __slots__ = ("arr", "_hash")

    def __init__(self, arr, dtype=None):
        self.arr = np.asarray(arr, dtype=dtype)
        self.arr.setflags(write=False)
        self._hash = None

    def __eq__(self, other):
        if isinstance(other, HArray):
            return (
                self.arr.shape == other.arr.shape
                and self.arr.dtype == other.arr.dtype
                and bool(np.array_equal(self.arr, other.arr))
            )
        return self.arr == other

    def __ne__(self, other):
        if isinstance(other, HArray):
            return not self.__eq__(other)
        return self.arr != other

    def __hash__(self):
        if self._hash is None:
            self._hash = hash((self.arr.shape, str(self.arr.dtype), self.arr.tobytes()))
        return self._hash

    def __array__(self, dtype=None, copy=None):
        return np.asarray(self.arr, dtype=dtype)

    def __getitem__(self, idx):
        return self.arr[idx]

    def __iter__(self):
        return iter(self.arr)

    def __len__(self):
        return len(self.arr)

    def astype(self, dtype):
        return self.arr.astype(dtype)

    @property
    def shape(self):
        return self.arr.shape

    def __repr__(self):
        return f"HArray({self.arr!r})"


@struct.dataclass
class Model:
    """Static scene description (one kinematic forest for the whole scene)."""

    # ---- static topology (numpy; unrolled at trace time) ----
    nq: int = struct.field(pytree_node=False)
    nv: int = struct.field(pytree_node=False)
    nbody: int = struct.field(pytree_node=False)
    ngeom: int = struct.field(pytree_node=False)

    body_parent: np.ndarray = struct.field(pytree_node=False)  # (nbody,) i32, world = 0, parent of world = -1
    body_jnt_type: np.ndarray = struct.field(pytree_node=False)  # (nbody,) i32
    body_q_adr: np.ndarray = struct.field(pytree_node=False)  # (nbody,) i32 into qpos
    body_dof_adr: np.ndarray = struct.field(pytree_node=False)  # (nbody,) i32 into qvel
    body_type: np.ndarray = struct.field(pytree_node=False)  # (nbody,) i32 DYNAMIC/KINEMATIC/STATIC
    geom_body: np.ndarray = struct.field(pytree_node=False)  # (ngeom,) i32
    geom_type: np.ndarray = struct.field(pytree_node=False)  # (ngeom,) i32
    # candidate collision pairs (precomputed broadphase over static topology)
    pair_geom1: np.ndarray = struct.field(pytree_node=False)  # (npair,) i32
    pair_geom2: np.ndarray = struct.field(pytree_node=False)  # (npair,) i32
    # per-dof static info
    dof_body: np.ndarray = struct.field(pytree_node=False)  # (nv,) i32
    dof_is_rot: np.ndarray = struct.field(pytree_node=False)  # (nv,) bool
    dof_limited: np.ndarray = struct.field(pytree_node=False)  # (nv,) bool
    ancestor_mask: np.ndarray = struct.field(pytree_node=False)  # (nbody, nv) f32

    # ---- physical parameters (jax arrays; broadcastable to (B, ...)) ----
    body_pos: jax.Array  # (nbody, 3) joint frame in parent coords
    body_quat: jax.Array  # (nbody, 4)
    jnt_axis: jax.Array  # (nbody, 3) local joint axis
    body_ipos: jax.Array  # (nbody, 3) COM offset in body frame
    body_iquat: jax.Array  # (nbody, 4) principal-inertia frame in body frame
    body_mass: jax.Array  # (nbody,)
    body_gravcomp: jax.Array  # (nbody,) 1.0 = gravity-free (balance_passive_force)
    body_inertia: jax.Array  # (nbody, 3) principal moments
    dof_damping: jax.Array  # (nv,)
    dof_stiffness: jax.Array  # (nv,) passive spring to springref (MJCF joint stiffness)
    dof_springref: jax.Array  # (nv,)
    dof_armature: jax.Array  # (nv,)
    dof_friction: jax.Array  # (nv,) dry friction loss (not yet applied)
    dof_limit: jax.Array  # (nv, 2) lower/upper (±inf if unlimited)
    # PD drives (configured by controllers; force mode)
    drive_kp: jax.Array  # (nv,)
    drive_kd: jax.Array  # (nv,)
    drive_force_limit: jax.Array  # (nv,)
    geom_pos: jax.Array  # (ngeom, 3) offset in body frame
    geom_quat: jax.Array  # (ngeom, 4)
    geom_size: jax.Array  # (ngeom, 3)
    geom_friction: jax.Array  # (ngeom,)

    # ---- solver / integration options ----
    gravity: jax.Array  # (3,)
    timestep: float = struct.field(pytree_node=False, default=0.01)
    solver_iterations: int = struct.field(pytree_node=False, default=32)
    contact_slop: float = struct.field(pytree_node=False, default=0.002)
    baumgarte: float = struct.field(pytree_node=False, default=0.2)
    max_correction_vel: float = struct.field(pytree_node=False, default=0.5)
    # speculative-contact margin: rows stay live within this separation
    # (solver allows approach up to the gap, never penetration); keeps the
    # warm start across micro-separations (PhysX contact_offset analog)
    contact_margin: float = struct.field(pytree_node=False, default=0.01)
    # top-K active-contact compaction (0 = disabled): the solver gathers the
    # K deepest candidate contacts per env and solves only those rows — the
    # candidate set is static and large, the ACTIVE set is small
    max_active_contacts: int = struct.field(pytree_node=False, default=0)
    # engine safety rails (PhysX maxLinearVelocity analog): break numerical
    # explosion chains before they reach inf/NaN
    max_qvel: float = struct.field(pytree_node=False, default=100.0)
    max_impulse: float = struct.field(pytree_node=False, default=1e4)

    # name maps (static metadata)
    body_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    geom_names: Tuple[str, ...] = struct.field(pytree_node=False, default=())

    # ---- mocap (marker) bodies ----
    # kinematic bodies with no collision geometry (goal sites, visual
    # markers). They carry NO dofs: their per-env pose lives in
    # Data.mocap_pose and is spliced into xpos/xquat after FK. This keeps nv
    # small (every (B, nv, ·) array in the dynamics spine shrinks) while
    # preserving the reference's repositionable-kinematic-actor semantics.
    mocap_bodies: Optional[np.ndarray] = struct.field(
        pytree_node=False, default=None
    )  # (M,) i32 body ids

    # ---- body-body 6-dof drives (reference structs/drive.py analog) ----
    # spring-damper wrenches pulling frame2 (on body2) toward frame1 (on
    # body1) composed with a per-env target relative pose (Data.drive6_target)
    drive6_body1: Optional[np.ndarray] = struct.field(
        pytree_node=False, default=None
    )  # (ND,) i32
    drive6_body2: Optional[np.ndarray] = struct.field(
        pytree_node=False, default=None
    )  # (ND,) i32
    drive6_pose1: Optional[jax.Array] = None  # (ND, 7) frame on body1
    drive6_pose2: Optional[jax.Array] = None  # (ND, 7) frame on body2
    drive6_stiffness: Optional[jax.Array] = None  # (ND, 2) [linear, angular]
    drive6_damping: Optional[jax.Array] = None  # (ND, 2)
    drive6_force_limit: Optional[jax.Array] = None  # (ND, 2)

    # ---- convex hull proxies (geom type HULL) ----
    # vertex clouds (local geom frame) padded to HULL_MAX_VERTS by repeating
    # the first vertex; face-normal candidate directions padded likewise.
    # The per-env heterogeneous variant carries a leading env axis.
    hull_verts: Optional[jax.Array] = None  # (NH, MAXV, 3) or (B, NH, MAXV, 3)
    hull_dirs: Optional[jax.Array] = None  # (NH, MAXD, 3)

    # per-geom coefficient of restitution (DefaultMaterialsConfig.restitution
    # and per-shape material overrides); None = all zero (fully inelastic)
    geom_restitution: Optional[jax.Array] = None  # (ngeom,) or (B, ngeom)
    # minimum approach speed for restitution (PhysX bounceThresholdVelocity)
    bounce_threshold: float = struct.field(pytree_node=False, default=2.0)
    geom_hull: Optional[np.ndarray] = struct.field(
        pytree_node=False, default=None
    )  # (ngeom,) i32 hull id or -1

    # host-side mirrors of parameters controllers/tasks read at scene-build
    # time (action-space limits, mass-dependent reward constants). Reading
    # the jax leaves there would synchronize device->host during
    # ``gym.make`` — the round-2 bench failure class.
    host_dof_limit: Optional[np.ndarray] = struct.field(
        pytree_node=False, default=None
    )  # (nv, 2) f32
    host_body_mass: Optional[np.ndarray] = struct.field(
        pytree_node=False, default=None
    )  # (nbody,) f32
    host_body_gravcomp: Optional[np.ndarray] = struct.field(
        pytree_node=False, default=None
    )  # (nbody,) f32

    @property
    def npair(self) -> int:
        return len(self.pair_geom1)


@struct.dataclass
class Contact:
    """Static-shape contact set; leading axis env batch, second axis contact id.

    ``geom1/geom2`` are static (ncon,) numpy arrays (each candidate pair expands
    to a fixed number of potential contact points at build time — the
    compile-time analog of the reference's ``GPUMemoryConfig.max_rigid_contact_
    count``, mani_skill/utils/structs/types.py:12-34).
    """

    geom1: np.ndarray = struct.field(pytree_node=False)
    geom2: np.ndarray = struct.field(pytree_node=False)
    pos: jax.Array = None  # (B, C, 3) world contact point
    normal: jax.Array = None  # (B, C, 3) unit normal, pushes geom1 out of geom2
    depth: jax.Array = None  # (B, C) penetration depth (>0 means touching)
    friction: jax.Array = None  # (B, C)
    restitution: jax.Array = None  # (B, C)
    impulse: jax.Array = None  # (B, C, 3) world-frame impulse applied to body of geom1
    # (B,) number of live (depth>0) candidates dropped by top-K compaction
    # this step — nonzero means the solver silently ignored real contacts
    # and ``max_active_contacts`` should be raised for this scene.
    overflow: jax.Array = None


@struct.dataclass
class Data:
    """Per-step simulation state (B = num_envs leading axis)."""

    qpos: jax.Array  # (B, nq)
    qvel: jax.Array  # (B, nv)
    # PD drive targets (written by controllers each control step)
    drive_target: jax.Array  # (B, nv)
    drive_vel_target: jax.Array  # (B, nv)
    # external applied forces
    qf_applied: jax.Array  # (B, nv)
    xfrc_applied: jax.Array  # (B, nbody, 6) [force(3) at COM, torque(3)], world frame
    # derived forward-kinematics quantities (filled by physics.forward)
    xpos: jax.Array  # (B, nbody, 3) body-frame origin, world
    xquat: jax.Array  # (B, nbody, 4)
    cvel: jax.Array  # (B, nbody, 6) [v_origin(3), omega(3)], world
    qacc: jax.Array  # (B, nv) last computed acceleration (smooth)
    contact: Optional[Contact] = None
    # per-env target relative pose for each body-body 6-dof drive
    # (frame2 is driven toward frame1 ∘ target); (B, ND, 7)
    drive6_target: Optional[jax.Array] = None
    # per-env poses of dof-less mocap (marker) bodies; (B, M, 7)
    mocap_pose: Optional[jax.Array] = None
    # task-specific persistent per-env state (e.g. sticky reward flags);
    # registered by envs at load time, reset-masked like everything else
    extras: Dict[str, jax.Array] = struct.field(default_factory=dict)

    @property
    def batch_size(self) -> int:
        return self.qpos.shape[0]


def make_data(model: Model, batch_size: int, qpos0: Optional[np.ndarray] = None) -> Data:
    """Allocate a fresh batched Data for ``model``."""
    B = batch_size
    if qpos0 is None:
        qpos0 = default_qpos(model)
    qpos = jnp.broadcast_to(jnp.asarray(qpos0, jnp.float32), (B, model.nq))
    z = jnp.zeros((B, model.nv), jnp.float32)
    data = Data(
        qpos=qpos,
        qvel=z,
        drive_target=z,
        drive_vel_target=z,
        qf_applied=z,
        xfrc_applied=jnp.zeros((B, model.nbody, 6), jnp.float32),
        xpos=jnp.zeros((B, model.nbody, 3), jnp.float32),
        xquat=jnp.broadcast_to(
            jnp.array([1.0, 0, 0, 0], jnp.float32), (B, model.nbody, 4)
        ),
        cvel=jnp.zeros((B, model.nbody, 6), jnp.float32),
        qacc=z,
        contact=None,
        drive6_target=(
            None
            if model.drive6_body1 is None
            else jnp.broadcast_to(
                jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32),
                (B, len(model.drive6_body1), 7),
            )
        ),
        mocap_pose=(
            None
            if model.mocap_bodies is None
            else jnp.broadcast_to(
                jnp.concatenate(
                    [
                        jnp.asarray(model.body_pos)[np.asarray(model.mocap_bodies)],
                        jnp.asarray(model.body_quat)[np.asarray(model.mocap_bodies)],
                    ],
                    axis=-1,
                ),
                (B, len(model.mocap_bodies), 7),
            )
        ),
        extras={},
    )
    return data


def default_qpos(model: Model) -> np.ndarray:
    """Neutral configuration: identity free-joint quats, zeros elsewhere."""
    qpos = np.zeros(model.nq, np.float32)
    for b in range(model.nbody):
        if model.body_jnt_type[b] == FREE:
            qpos[model.body_q_adr[b] + 3] = 1.0
    return qpos

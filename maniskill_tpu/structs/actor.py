"""Batched ``Actor`` view over the physics state.

Counterpart of mani_skill/utils/structs/actor.py: every property reads/writes
the batched state transparently. Here there is no CPU/GPU split and no CUDA
buffer indexing — an Actor is a (scene, body_id) view; setters are masked by
the scene's partial-reset mask exactly like the reference's
``_body_data_index[reset_mask]`` writes (actor.py:389-391), but expressed as a
``where`` over the state pytree.
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pose import Pose
from ..physics.types import DYNAMIC, KINEMATIC, STATIC, FREE

if TYPE_CHECKING:
    from ..envs.scene import ManiSkillScene


class Actor:
    def __init__(
        self,
        scene: "ManiSkillScene",
        name: str,
        body_id: int,
        body_type: int,
        initial_pose: Optional[np.ndarray] = None,
    ):
        self.scene = scene
        self.name = name
        self.body_id = body_id
        self.body_type = body_type
        self.initial_pose = initial_pose
        self.per_scene_id = None  # segmentation id, assigned by scene
        # q/dof addresses wired by scene.finalize() (model exists only then)
        self._q_adr = None
        self._dof_adr = None
        # index into Data.mocap_pose for dof-less kinematic markers
        self._mocap_idx = None

    # ------------------------------------------------------------------
    @property
    def px_body_type(self) -> str:
        return {DYNAMIC: "dynamic", KINEMATIC: "kinematic", STATIC: "static"}[
            self.body_type
        ]

    @property
    def is_static(self) -> bool:
        return self.body_type == STATIC

    # -- pose ----------------------------------------------------------
    @property
    def pose(self) -> Pose:
        if self.is_static:
            raw = jnp.asarray(self.initial_pose, jnp.float32)
            return Pose(jnp.broadcast_to(raw, (self.scene.num_envs, 7)))
        if self._mocap_idx is not None:
            return Pose(self.scene.data.mocap_pose[:, self._mocap_idx])
        qa = self._q_adr
        return Pose(self.scene.data.qpos[:, qa : qa + 7])

    @pose.setter
    def pose(self, pose):
        self.set_pose(pose)

    def set_pose(self, pose):
        if self.is_static:
            raise RuntimeError(f"cannot set pose of static actor {self.name}")
        raw = Pose.create(pose).raw_pose
        raw = jnp.broadcast_to(raw, (self.scene.num_envs, 7)).astype(jnp.float32)
        d = self.scene.data
        if self._mocap_idx is not None:
            mi = self._mocap_idx
            cur = d.mocap_pose[:, mi]
            new = self.scene.masked(raw, cur)
            self.scene.data = d.replace(
                mocap_pose=d.mocap_pose.at[:, mi].set(new)
            )
            return
        qa = self._q_adr
        cur = d.qpos[:, qa : qa + 7]
        new = self.scene.masked(raw, cur)
        self.scene.data = d.replace(qpos=d.qpos.at[:, qa : qa + 7].set(new))

    # -- velocities ----------------------------------------------------
    @property
    def linear_velocity(self) -> jax.Array:
        if self.is_static or self._mocap_idx is not None:
            return jnp.zeros((self.scene.num_envs, 3), jnp.float32)
        va = self._dof_adr
        return self.scene.data.qvel[:, va : va + 3]

    @linear_velocity.setter
    def linear_velocity(self, v):
        self.set_linear_velocity(v)

    def set_linear_velocity(self, v):
        self._set_vel(slice(0, 3), v)

    @property
    def angular_velocity(self) -> jax.Array:
        if self.is_static or self._mocap_idx is not None:
            return jnp.zeros((self.scene.num_envs, 3), jnp.float32)
        va = self._dof_adr
        return self.scene.data.qvel[:, va + 3 : va + 6]

    @angular_velocity.setter
    def angular_velocity(self, v):
        self.set_angular_velocity(v)

    def set_angular_velocity(self, v):
        self._set_vel(slice(3, 6), v)

    def _set_vel(self, sl, v):
        if self.is_static:
            raise RuntimeError(f"cannot set velocity of static actor {self.name}")
        if self._mocap_idx is not None:
            return  # mocap markers have no dofs; velocity is identically zero
        va = self._dof_adr
        lo, hi = va + sl.start, va + sl.stop
        v = jnp.broadcast_to(jnp.asarray(v, jnp.float32), (self.scene.num_envs, sl.stop - sl.start))
        d = self.scene.data
        new = self.scene.masked(v, d.qvel[:, lo:hi])
        self.scene.data = d.replace(qvel=d.qvel.at[:, lo:hi].set(new))

    # -- state (13,) = [pose7, linvel3, angvel3] -------------------------
    def get_state(self) -> jax.Array:
        return jnp.concatenate(
            [self.pose.raw_pose, self.linear_velocity, self.angular_velocity], axis=-1
        )

    def set_state(self, state):
        state = jnp.asarray(state, jnp.float32)
        self.set_pose(Pose(state[..., :7]))
        self.set_linear_velocity(state[..., 7:10])
        self.set_angular_velocity(state[..., 10:13])

    # -- forces ----------------------------------------------------------
    def apply_force(self, force, torque=None):
        """Apply a world-frame external force at COM for the next step."""
        d = self.scene.data
        b = self.body_id
        f = jnp.broadcast_to(jnp.asarray(force, jnp.float32), (self.scene.num_envs, 3))
        x = d.xfrc_applied.at[:, b, :3].add(f)
        if torque is not None:
            t = jnp.broadcast_to(jnp.asarray(torque, jnp.float32), (self.scene.num_envs, 3))
            x = x.at[:, b, 3:].add(t)
        self.scene.data = d.replace(xfrc_applied=x)

    def get_net_contact_forces(self) -> jax.Array:
        """Net contact force (B, 3) on this actor (base.py:116-144 parity)."""
        return self.scene.net_contact_forces_for_bodies([self.body_id])

    def is_static_check(self, lin_thresh: float = 1e-2, ang_thresh: float = 0.5):
        """Batched rest check (actor.py is_static semantics)."""
        v = jnp.linalg.norm(self.linear_velocity, axis=-1)
        w = jnp.linalg.norm(self.angular_velocity, axis=-1)
        return (v <= lin_thresh) & (w <= ang_thresh)

    # -- misc ------------------------------------------------------------
    @property
    def geom_ids(self):
        gb = np.asarray(self.scene.model.geom_body)
        return np.nonzero(gb == self.body_id)[0]

    def __repr__(self):
        return f"Actor({self.name}, body={self.body_id}, {self.px_body_type})"

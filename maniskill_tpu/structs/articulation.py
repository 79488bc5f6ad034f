"""Batched ``Articulation`` + ``ArticulationJoint`` views.

Counterparts of mani_skill/utils/structs/articulation.py and
articulation_joint.py. An articulation is a set of links (bodies) in the
forest plus its active (1-dof) joints; qpos/qvel/drive-target properties view
contiguous/gathered columns of the batched state.
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .pose import Pose
from .link import Link
from ..physics.types import FREE, HINGE, SLIDE

if TYPE_CHECKING:
    from ..envs.scene import ManiSkillScene


class ArticulationJoint:
    def __init__(
        self,
        scene: "ManiSkillScene",
        name: str,
        body_id: int,
        jnt_type: int,
        q_adr: int,
        dof_adr: int,
        active_index: Optional[int],
        parent_link: Optional[Link],
        child_link: Optional[Link],
    ):
        self.scene = scene
        self.name = name
        self.body_id = body_id
        self.jnt_type = jnt_type
        self.q_adr = q_adr
        self.dof_adr = dof_adr
        self.active_index = active_index
        self.parent_link = parent_link
        self.child_link = child_link

    @property
    def type(self) -> str:
        return {FREE: "free", HINGE: "revolute", SLIDE: "prismatic"}.get(
            self.jnt_type, "fixed"
        )

    @property
    def qpos(self) -> jax.Array:
        return self.scene.data.qpos[:, self.q_adr : self.q_adr + 1]

    @property
    def qvel(self) -> jax.Array:
        return self.scene.data.qvel[:, self.dof_adr : self.dof_adr + 1]

    @property
    def limits(self) -> jax.Array:
        return self.scene.model.dof_limit[self.dof_adr]

    @property
    def drive_target(self) -> jax.Array:
        return self.scene.data.drive_target[:, self.dof_adr : self.dof_adr + 1]

    def set_drive_target(self, target):
        d = self.scene.data
        t = jnp.broadcast_to(jnp.asarray(target, jnp.float32), (self.scene.num_envs,))
        cur = d.drive_target[:, self.dof_adr]
        self.scene.data = d.replace(
            drive_target=d.drive_target.at[:, self.dof_adr].set(self.scene.masked(t, cur))
        )

    def set_drive_velocity_target(self, target):
        d = self.scene.data
        t = jnp.broadcast_to(jnp.asarray(target, jnp.float32), (self.scene.num_envs,))
        cur = d.drive_vel_target[:, self.dof_adr]
        self.scene.data = d.replace(
            drive_vel_target=d.drive_vel_target.at[:, self.dof_adr].set(
                self.scene.masked(t, cur)
            )
        )

    def set_drive_properties(self, stiffness, damping, force_limit=np.inf, mode="force"):
        """Update PD gains (articulation_joint.py:187-195 parity)."""
        self.scene.set_drive_properties([self.dof_adr], stiffness, damping, force_limit)


class Articulation:
    def __init__(self, scene: "ManiSkillScene", name: str):
        self.scene = scene
        self.name = name
        self.links: List[Link] = []
        self.links_map: Dict[str, Link] = {}
        self.joints: List[ArticulationJoint] = []
        self.joints_map: Dict[str, ArticulationJoint] = {}
        self.active_joints: List[ArticulationJoint] = []
        self.root: Optional[Link] = None
        self.fixed_root = True
        self.root_q_adr: Optional[int] = None  # set when root joint is FREE
        self.root_dof_adr: Optional[int] = None
        # numpy index tables for gathered column access
        self._qadr: np.ndarray = None  # (dof,) qpos columns of active joints
        self._vadr: np.ndarray = None  # (dof,) qvel columns

    def _finalize_indices(self):
        self._qadr = np.array([j.q_adr for j in self.active_joints], np.int32)
        self._vadr = np.array([j.dof_adr for j in self.active_joints], np.int32)

    # ------------------------------------------------------------------
    @property
    def dof(self) -> int:
        return len(self.active_joints)

    @property
    def max_dof(self) -> int:
        return self.dof

    def get_link(self, name: str) -> Link:
        return self.links_map[name]

    # -- joint state -----------------------------------------------------
    @property
    def qpos(self) -> jax.Array:
        return self.scene.data.qpos[:, self._qadr]

    @qpos.setter
    def qpos(self, value):
        self.set_qpos(value)

    def set_qpos(self, value):
        v = jnp.broadcast_to(
            jnp.asarray(value, jnp.float32), (self.scene.num_envs, self.dof)
        )
        d = self.scene.data
        cur = d.qpos[:, self._qadr]
        self.scene.data = d.replace(
            qpos=d.qpos.at[:, self._qadr].set(self.scene.masked(v, cur))
        )

    @property
    def qvel(self) -> jax.Array:
        return self.scene.data.qvel[:, self._vadr]

    @qvel.setter
    def qvel(self, value):
        self.set_qvel(value)

    def set_qvel(self, value):
        v = jnp.broadcast_to(
            jnp.asarray(value, jnp.float32), (self.scene.num_envs, self.dof)
        )
        d = self.scene.data
        cur = d.qvel[:, self._vadr]
        self.scene.data = d.replace(
            qvel=d.qvel.at[:, self._vadr].set(self.scene.masked(v, cur))
        )

    @property
    def qlimits(self) -> jax.Array:
        lim = self.scene.model.dof_limit[self._vadr]
        return jnp.broadcast_to(lim, (self.scene.num_envs, self.dof, 2))

    # -- root ------------------------------------------------------------
    @property
    def pose(self) -> Pose:
        return self.root_pose

    @pose.setter
    def pose(self, p):
        self.set_root_pose(p)

    @property
    def root_pose(self) -> Pose:
        if self.fixed_root:
            d = self.scene.data
            b = self.root.body_id
            return Pose(
                jnp.concatenate([d.xpos[:, b], d.xquat[:, b]], axis=-1)
            )
        qa = self.root_q_adr
        return Pose(self.scene.data.qpos[:, qa : qa + 7])

    def set_root_pose(self, pose):
        if self.fixed_root:
            raise RuntimeError(
                f"articulation {self.name} has a fixed root; rebuild to move it"
            )
        raw = jnp.broadcast_to(
            Pose.create(pose).raw_pose, (self.scene.num_envs, 7)
        ).astype(jnp.float32)
        qa = self.root_q_adr
        d = self.scene.data
        cur = d.qpos[:, qa : qa + 7]
        self.scene.data = d.replace(
            qpos=d.qpos.at[:, qa : qa + 7].set(self.scene.masked(raw, cur))
        )

    @property
    def root_linear_velocity(self) -> jax.Array:
        if self.fixed_root:
            return jnp.zeros((self.scene.num_envs, 3), jnp.float32)
        va = self.root_dof_adr
        return self.scene.data.qvel[:, va : va + 3]

    @property
    def root_angular_velocity(self) -> jax.Array:
        if self.fixed_root:
            return jnp.zeros((self.scene.num_envs, 3), jnp.float32)
        va = self.root_dof_adr
        return self.scene.data.qvel[:, va + 3 : va + 6]

    # -- drives ----------------------------------------------------------
    def set_joint_drive_targets(self, targets, joints: Optional[List[ArticulationJoint]] = None):
        """Write PD position targets (articulation.py:873-897 parity)."""
        joints = joints if joints is not None else self.active_joints
        vadr = np.array([j.dof_adr for j in joints], np.int32)
        v = jnp.broadcast_to(
            jnp.asarray(targets, jnp.float32), (self.scene.num_envs, len(joints))
        )
        d = self.scene.data
        cur = d.drive_target[:, vadr]
        self.scene.data = d.replace(
            drive_target=d.drive_target.at[:, vadr].set(self.scene.masked(v, cur))
        )

    def set_joint_drive_velocity_targets(self, targets, joints=None):
        joints = joints if joints is not None else self.active_joints
        vadr = np.array([j.dof_adr for j in joints], np.int32)
        v = jnp.broadcast_to(
            jnp.asarray(targets, jnp.float32), (self.scene.num_envs, len(joints))
        )
        d = self.scene.data
        cur = d.drive_vel_target[:, vadr]
        self.scene.data = d.replace(
            drive_vel_target=d.drive_vel_target.at[:, vadr].set(self.scene.masked(v, cur))
        )

    @property
    def drive_targets(self) -> jax.Array:
        return self.scene.data.drive_target[:, self._vadr]

    @property
    def drive_velocity_targets(self) -> jax.Array:
        return self.scene.data.drive_vel_target[:, self._vadr]

    # -- state dict (13 + 2*dof layout, articulation.py:283-318 parity) ---
    def get_state(self) -> jax.Array:
        root = self.root_pose.raw_pose
        rv = self.root_linear_velocity
        rw = self.root_angular_velocity
        return jnp.concatenate([root, rv, rw, self.qpos, self.qvel], axis=-1)

    def set_state(self, state):
        state = jnp.asarray(state, jnp.float32)
        if not self.fixed_root:
            self.set_root_pose(Pose(state[..., :7]))
            qa = self.root_dof_adr
            d = self.scene.data
            v = state[..., 7:13]
            cur = d.qvel[:, qa : qa + 6]
            self.scene.data = d.replace(
                qvel=d.qvel.at[:, qa : qa + 6].set(self.scene.masked(v, cur))
            )
        n = self.dof
        self.set_qpos(state[..., 13 : 13 + n])
        self.set_qvel(state[..., 13 + n : 13 + 2 * n])

    # -- contacts --------------------------------------------------------
    def get_net_contact_forces(self, link_names: Optional[List[str]] = None) -> jax.Array:
        links = (
            [self.links_map[n] for n in link_names] if link_names else self.links
        )
        forces = [
            self.scene.net_contact_forces_for_bodies([l.body_id]) for l in links
        ]
        return jnp.stack(forces, axis=1)  # (B, num_links, 3)

    def __repr__(self):
        return f"Articulation({self.name}, dof={self.dof}, links={len(self.links)})"

"""PD end-effector pos/pose controllers (counterpart of
mani_skill/agents/controllers/pd_ee_pose.py:25-270).

Actions are EE-space deltas (or absolute targets); an in-jit batched
damped-least-squares IK converts them to joint PD targets. Frames follow the
reference: translation deltas in the robot-root frame, rotation deltas about
the EE body with root-aligned axes ("root_translation:root_aligned_body_rotation").
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Union

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from ...structs.pose import Pose
from ...utils.geometry import rotation_conversions as rc
from .base_controller import BaseController, ControllerConfig
from .pd_joint_pos import PDJointPosController, PDJointPosControllerConfig
from .utils.kinematics import Kinematics


@dataclasses.dataclass
class PDEEPosControllerConfig(PDJointPosControllerConfig):
    urdf_path: Optional[str] = None
    ee_link: Optional[str] = None
    frame: str = "root_translation"
    use_delta: bool = True
    normalize_action: bool = True
    pos_lower: float = -0.1
    pos_upper: float = 0.1

    @property
    def controller_cls(self):
        return PDEEPosController


class PDEEPosController(PDJointPosController):
    config: PDEEPosControllerConfig
    _action_dim = 3

    def _initialize_action_space(self):
        n = self._action_dim
        self._lo = jnp.full((n,), self.config.pos_lower, jnp.float32)
        self._hi = jnp.full((n,), self.config.pos_upper, jnp.float32)
        if self.config.normalize_action:
            self._action_space = gym.spaces.Box(-1.0, 1.0, (n,), np.float32)
        else:
            self._action_space = gym.spaces.Box(
                np.asarray(self._lo), np.asarray(self._hi), dtype=np.float32
            )

    def _setup_kinematics(self):
        if not hasattr(self, "kinematics"):
            self.kinematics = Kinematics(
                self.scene, self.articulation, self.config.ee_link,
                self.config.joint_names,
            )

    @property
    def ee_pose(self) -> Pose:
        return self.articulation.links_map[
            self.config.ee_link.split(":")[-1]
            if self.config.ee_link not in self.articulation.links_map
            else self.config.ee_link
        ].pose

    @property
    def ee_pose_at_base(self) -> Pose:
        return self.articulation.root_pose.inv() * self.ee_pose

    def _ref_ee_pq(self):
        """Reference EE pose for delta composition: the *current* EE pose, or
        (use_target) the EE pose implied by the persisted joint targets — FK
        of drive_target — which makes zero deltas hold position exactly
        (reference pd_ee_pose.py target_pose caching)."""
        if self.config.use_target:
            q_prev = self.scene.data.drive_target[:, self.kinematics.dof_adrs]
            data_fk = self.kinematics._fk(q_prev)
            eb = self.kinematics.end_link.body_id
            return data_fk.xpos[:, eb], data_fk.xquat[:, eb], q_prev
        cur = self.ee_pose
        q0 = self.scene.data.qpos[:, self.q_adrs]
        return cur.p, cur.q, q0

    def _target_ee_pose(self, action: jax.Array) -> jax.Array:
        """action -> world-frame target EE pose (B, 7)."""
        root = self.articulation.root_pose
        cur_p, cur_q, _ = self._ref_ee_pq()
        cur = Pose.create_from_pq(p=cur_p, q=cur_q)
        if self.config.use_delta:
            # translation delta expressed in root frame
            dp_world = rc.quaternion_apply(root.q, action[..., :3])
            p = cur.p + dp_world
            q = cur.q
            return jnp.concatenate([p, q], axis=-1)
        # absolute target in root frame
        target = root * Pose.create_from_pq(p=action[..., :3])
        return jnp.concatenate([target.p, cur.q], axis=-1)

    def set_action(self, action: jax.Array):
        self._setup_kinematics()
        action = jnp.asarray(action, jnp.float32)
        if self.config.normalize_action:
            action = self._clip_and_scale_action(action, self._lo, self._hi)
        action = jnp.broadcast_to(
            action, (self.scene.num_envs,) + action.shape[-1:]
        )
        target = self._target_ee_pose(action)
        _, _, q0 = self._ref_ee_pq()
        q_new = self.kinematics.compute_ik(
            target, q0, pos_only=self._action_dim == 3
        )
        lims = self._joint_limits()
        q_new = jnp.clip(q_new, lims[:, 0], lims[:, 1])
        self._set_target(q_new)


@dataclasses.dataclass
class PDEEPoseControllerConfig(PDEEPosControllerConfig):
    rot_lower: float = -0.1
    rot_upper: float = 0.1
    frame: str = "root_translation:root_aligned_body_rotation"

    @property
    def controller_cls(self):
        return PDEEPoseController


class PDEEPoseController(PDEEPosController):
    config: PDEEPoseControllerConfig
    _action_dim = 6

    def _initialize_action_space(self):
        lo = np.concatenate(
            [np.full(3, self.config.pos_lower), np.full(3, self.config.rot_lower)]
        ).astype(np.float32)
        hi = np.concatenate(
            [np.full(3, self.config.pos_upper), np.full(3, self.config.rot_upper)]
        ).astype(np.float32)
        self._lo, self._hi = jnp.asarray(lo), jnp.asarray(hi)
        if self.config.normalize_action:
            self._action_space = gym.spaces.Box(-1.0, 1.0, (6,), np.float32)
        else:
            self._action_space = gym.spaces.Box(lo, hi, dtype=np.float32)

    def _target_ee_pose(self, action: jax.Array) -> jax.Array:
        root = self.articulation.root_pose
        cur_p, cur_q, _ = self._ref_ee_pq()
        cur = Pose.create_from_pq(p=cur_p, q=cur_q)
        if self.config.use_delta:
            dp_world = rc.quaternion_apply(root.q, action[..., :3])
            p = cur.p + dp_world
            # rotation delta about EE origin with root-aligned axes
            dq_root = rc.axis_angle_to_quaternion(action[..., 3:])
            dq_world = rc.quaternion_multiply(
                root.q, rc.quaternion_multiply(dq_root, rc.quaternion_conjugate(root.q))
            )
            q = rc.quaternion_multiply(dq_world, cur.q)
            return jnp.concatenate([p, q], axis=-1)
        target = root * Pose.create_from_pq(
            p=action[..., :3], q=rc.axis_angle_to_quaternion(action[..., 3:])
        )
        return target.raw_pose

"""PDBaseVel controllers (counterpart of pd_base_vel.py:1-73).

Ego-centric 2D base control for mobile robots: action [vx, vy, wz] in the
robot frame drives (x, y, yaw) velocity targets of the base's planar joints.
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .pd_joint_vel import PDJointVelController, PDJointVelControllerConfig


@dataclasses.dataclass
class PDBaseVelControllerConfig(PDJointVelControllerConfig):
    @property
    def controller_cls(self):
        return PDBaseVelController


class PDBaseVelController(PDJointVelController):
    """Joints expected in order [root_x, root_y, root_yaw] (+ optional more)."""

    ACTION_DIM = 3  # ego-centric [vx, vy, wz]

    def _initialize_action_space(self):
        import gymnasium as gym

        n = self.ACTION_DIM
        lo = np.broadcast_to(np.asarray(self.config.lower, np.float32), (n,))
        hi = np.broadcast_to(np.asarray(self.config.upper, np.float32), (n,))
        self._lo, self._hi = jnp.asarray(lo), jnp.asarray(hi)
        if self.config.normalize_action:
            self._action_space = gym.spaces.Box(-1.0, 1.0, (n,), np.float32)
        else:
            self._action_space = gym.spaces.Box(lo, hi, dtype=np.float32)

    def set_action(self, action: jax.Array):
        action = jnp.asarray(action, jnp.float32)
        if self.config.normalize_action:
            action = self._clip_and_scale_action(action, self._lo, self._hi)
        # rotate ego-centric (vx, vy) by the current yaw
        yaw = self.scene.data.qpos[:, self.q_adrs[2]]
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        vx = action[..., 0] * c - action[..., 1] * s
        vy = action[..., 0] * s + action[..., 1] * c
        vel = jnp.stack([vx, vy, action[..., 2]], axis=-1)
        d = self.scene.data
        self.scene.data = d.replace(
            drive_vel_target=d.drive_vel_target.at[:, self.dof_adrs[:3]].set(vel)
        )


@dataclasses.dataclass
class PDBaseForwardVelControllerConfig(PDJointVelControllerConfig):
    @property
    def controller_cls(self):
        return PDBaseForwardVelController


class PDBaseForwardVelController(PDBaseVelController):
    """Nonholonomic variant: action [v_forward, wz]."""

    ACTION_DIM = 2

    def set_action(self, action: jax.Array):
        action = jnp.asarray(action, jnp.float32)
        if self.config.normalize_action:
            action = self._clip_and_scale_action(action, self._lo, self._hi)
        yaw = self.scene.data.qpos[:, self.q_adrs[2]]
        vx = action[..., 0] * jnp.cos(yaw)
        vy = action[..., 0] * jnp.sin(yaw)
        vel = jnp.stack([vx, vy, action[..., 1]], axis=-1)
        d = self.scene.data
        self.scene.data = d.replace(
            drive_vel_target=d.drive_vel_target.at[:, self.dof_adrs[:3]].set(vel)
        )

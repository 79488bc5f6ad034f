"""PD joint velocity controller (counterpart of pd_joint_vel.py:1-47)."""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Union

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from .base_controller import BaseController, ControllerConfig


@dataclasses.dataclass
class PDJointVelControllerConfig(ControllerConfig):
    joint_names: List[str] = None
    lower: Union[float, Sequence[float]] = -1.0
    upper: Union[float, Sequence[float]] = 1.0
    damping: Union[float, Sequence[float]] = 10.0
    force_limit: Union[float, Sequence[float]] = 1e10
    friction: Union[float, Sequence[float]] = 0.0
    normalize_action: bool = True

    @property
    def controller_cls(self):
        return PDJointVelController


class PDJointVelController(BaseController):
    sets_target_qvel = True

    def _initialize_action_space(self):
        n = len(self.config.joint_names)
        lo = np.broadcast_to(np.asarray(self.config.lower, np.float32), (n,))
        hi = np.broadcast_to(np.asarray(self.config.upper, np.float32), (n,))
        self._lo, self._hi = jnp.asarray(lo), jnp.asarray(hi)
        if self.config.normalize_action:
            self._action_space = gym.spaces.Box(-1.0, 1.0, (n,), np.float32)
        else:
            self._action_space = gym.spaces.Box(lo, hi, dtype=np.float32)

    def set_drive_property(self):
        n = len(self.joints)
        kd = np.broadcast_to(np.asarray(self.config.damping, np.float32), (n,))
        fl = np.broadcast_to(np.asarray(self.config.force_limit, np.float32), (n,))
        self.scene.set_drive_properties(self.dof_adrs, np.zeros(n, np.float32), kd, fl)

    def reset(self):
        d = self.scene.data
        zeros = jnp.zeros((self.scene.num_envs, len(self.joints)), jnp.float32)
        cur = d.drive_vel_target[:, self.dof_adrs]
        self.scene.data = d.replace(
            drive_vel_target=d.drive_vel_target.at[:, self.dof_adrs].set(
                self.scene.masked(zeros, cur)
            )
        )

    def set_action(self, action: jax.Array):
        action = jnp.asarray(action, jnp.float32)
        if self.config.normalize_action:
            action = self._clip_and_scale_action(action, self._lo, self._hi)
        v = jnp.broadcast_to(action, (self.scene.num_envs, len(self.joints)))
        d = self.scene.data
        self.scene.data = d.replace(
            drive_vel_target=d.drive_vel_target.at[:, self.dof_adrs].set(v)
        )

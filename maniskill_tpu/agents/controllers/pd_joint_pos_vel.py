"""PDJointPosVel controller (counterpart of pd_joint_pos_vel.py:1-68):
action = [target positions, target velocities] per joint."""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Union

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from .pd_joint_pos import PDJointPosController, PDJointPosControllerConfig


@dataclasses.dataclass
class PDJointPosVelControllerConfig(PDJointPosControllerConfig):
    vel_lower: Union[float, Sequence[float]] = -1.0
    vel_upper: Union[float, Sequence[float]] = 1.0

    @property
    def controller_cls(self):
        return PDJointPosVelController


class PDJointPosVelController(PDJointPosController):
    sets_target_qpos = True
    sets_target_qvel = True

    def _initialize_action_space(self):
        super()._initialize_action_space()
        n = len(self.config.joint_names)
        vlo = np.broadcast_to(np.asarray(self.config.vel_lower, np.float32), (n,))
        vhi = np.broadcast_to(np.asarray(self.config.vel_upper, np.float32), (n,))
        self._vlo, self._vhi = jnp.asarray(vlo), jnp.asarray(vhi)
        if self.config.normalize_action:
            self._action_space = gym.spaces.Box(-1.0, 1.0, (2 * n,), np.float32)
        else:
            lo = np.concatenate([np.asarray(self._lo), vlo])
            hi = np.concatenate([np.asarray(self._hi), vhi])
            self._action_space = gym.spaces.Box(lo, hi, dtype=np.float32)

    def set_action(self, action: jax.Array):
        n = len(self.joints)
        action = jnp.asarray(action, jnp.float32)
        pos_a, vel_a = action[..., :n], action[..., n:]
        if self.config.normalize_action:
            pos_a = self._clip_and_scale_action(pos_a, self._lo, self._hi)
            vel_a = self._clip_and_scale_action(vel_a, self._vlo, self._vhi)
        if self.config.use_delta:
            base = (
                self._target_qpos()
                if self.config.use_target
                else self.scene.data.qpos[:, self.q_adrs]
            )
            target = base + pos_a
        else:
            target = jnp.broadcast_to(pos_a, (self.scene.num_envs, n))
        lims = self._joint_limits()
        self._set_target(jnp.clip(target, lims[:, 0], lims[:, 1]))
        d = self.scene.data
        vt = jnp.broadcast_to(vel_a, (self.scene.num_envs, n))
        self.scene.data = d.replace(
            drive_vel_target=d.drive_vel_target.at[:, self.dof_adrs].set(vt)
        )

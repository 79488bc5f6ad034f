"""Passive controller: joints take no action (passive_controller.py:1-42)."""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Union

import gymnasium as gym
import numpy as np

from .base_controller import BaseController, ControllerConfig


@dataclasses.dataclass
class PassiveControllerConfig(ControllerConfig):
    joint_names: List[str] = None
    damping: Union[float, Sequence[float]] = 0.0
    force_limit: Union[float, Sequence[float]] = 1e10
    friction: Union[float, Sequence[float]] = 0.0
    normalize_action: bool = True

    @property
    def controller_cls(self):
        return PassiveController


class PassiveController(BaseController):
    def _initialize_action_space(self):
        self._action_space = gym.spaces.Box(
            np.zeros(0, np.float32), np.zeros(0, np.float32), dtype=np.float32
        )

    def set_drive_property(self):
        n = len(self.joints)
        kd = np.broadcast_to(np.asarray(self.config.damping, np.float32), (n,))
        fl = np.broadcast_to(np.asarray(self.config.force_limit, np.float32), (n,))
        self.scene.set_drive_properties(self.dof_adrs, np.zeros(n, np.float32), kd, fl)

    def set_action(self, action):
        pass

"""BaseRealAgent (counterpart of mani_skill/agents/base_real_agent.py).

Interface for a real robot that mirrors a sim agent's action/obs contract.
Users subclass and implement the hardware I/O; ``Sim2RealEnv`` drives it.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class BaseRealAgent:
    """Abstract driver for a physical robot paired with a sim agent uid."""

    uid: str = "base_real_agent"

    def __init__(self):
        self._sensors = {}

    # -- lifecycle -------------------------------------------------------
    def start(self):
        """Connect to hardware."""
        raise NotImplementedError

    def stop(self):
        """Disconnect / power down."""
        raise NotImplementedError

    def reset(self, qpos: Optional[np.ndarray] = None):
        """Move the robot to the given joint configuration (blocking)."""
        raise NotImplementedError

    # -- control ---------------------------------------------------------
    def set_target_qpos(self, qpos: np.ndarray):
        raise NotImplementedError

    def set_target_qvel(self, qvel: np.ndarray):
        raise NotImplementedError

    # -- state -----------------------------------------------------------
    def get_qpos(self) -> np.ndarray:
        raise NotImplementedError

    def get_qvel(self) -> np.ndarray:
        raise NotImplementedError

    def get_sensor_data(self) -> Dict[str, Dict[str, np.ndarray]]:
        """Return {sensor_name: {"rgb": HxWx3 uint8, ...}}."""
        raise NotImplementedError

    def get_proprioception(self) -> Dict[str, np.ndarray]:
        return dict(qpos=self.get_qpos(), qvel=self.get_qvel())

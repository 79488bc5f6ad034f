"""Controller base classes.

Counterpart of mani_skill/agents/controllers/base_controller.py (:26-347).
Key difference from the reference: controller *state* (PD targets) lives in
the physics ``Data`` pytree (drive_target / drive_vel_target), so controllers
are stateless tracers — ``set_action`` runs inside the jitted step and
functionally updates scene.data; partial-reset masking comes for free from the
scene's masked writes.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Union

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from ...structs.articulation import Articulation, ArticulationJoint


@dataclasses.dataclass
class ControllerConfig:
    joint_names: List[str] = None
    normalize_action: bool = True


class BaseController:
    """Drives a subset of an articulation's joints from flat actions."""

    sets_target_qpos = False
    sets_target_qvel = False

    def __init__(self, config, articulation: Articulation, scene):
        self.config = config
        self.articulation = articulation
        self.scene = scene
        self.joints: List[ArticulationJoint] = [
            articulation.joints_map[n] if n in articulation.joints_map
            else self._joint_by_any_name(articulation, n)
            for n in config.joint_names
        ]
        self.dof_adrs = np.array([j.dof_adr for j in self.joints], np.int32)
        self.q_adrs = np.array([j.q_adr for j in self.joints], np.int32)
        self._action_space = None
        self._initialize_action_space()

    @staticmethod
    def _joint_by_any_name(articulation: Articulation, name: str) -> ArticulationJoint:
        for j in articulation.joints:
            if j.name == name or j.name.endswith(":" + name):
                return j
        raise KeyError(
            f"joint {name!r} not found in {articulation.name}; "
            f"known: {list(articulation.joints_map)}"
        )

    # -- spaces ----------------------------------------------------------
    @property
    def action_space(self) -> gym.Space:
        return self._action_space

    @property
    def single_action_space(self) -> gym.Space:
        return self._action_space

    def _initialize_action_space(self):
        raise NotImplementedError

    def _clip_and_scale_action(self, action: jax.Array, low, high) -> jax.Array:
        """Map normalized [-1,1] action to [low, high] (base_controller.py:159-174)."""
        action = jnp.clip(action, -1.0, 1.0)
        low = jnp.asarray(low, jnp.float32)
        high = jnp.asarray(high, jnp.float32)
        return 0.5 * (high + low) + 0.5 * (high - low) * action

    # -- lifecycle -------------------------------------------------------
    def set_drive_property(self):
        """Write PD gains into the model (called once at controller setup)."""

    def reset(self):
        """Reset controller targets for envs selected by the scene reset mask."""

    def set_action(self, action: jax.Array):
        raise NotImplementedError

    def before_simulation_step(self, data, substep: int):
        """Per-substep hook (interpolation); pure: returns updated Data."""
        return data

    # -- proprioception helpers -----------------------------------------
    @property
    def qpos(self) -> jax.Array:
        return self.scene.data.qpos[:, self.q_adrs]

    @property
    def qvel(self) -> jax.Array:
        return self.scene.data.qvel[:, self.dof_adrs]

    def get_state(self) -> Dict:
        return {}

    def set_state(self, state: Dict):
        pass


class DictController(BaseController):
    """Combines named sub-controllers into a dict action space
    (base_controller.py:193-307)."""

    def __init__(self, configs: Dict[str, object], articulation, scene, balance_passive_force=True):
        self.scene = scene
        self.articulation = articulation
        self.configs = configs
        self.controllers: Dict[str, BaseController] = {}
        for uid, cfg in configs.items():
            self.controllers[uid] = cfg.controller_cls(cfg, articulation, scene)
        # aggregate the apply-gating flags over sub-controllers (the
        # reference ORs these the same way so BaseEnv only stages the drive
        # buffers a controller actually writes, sapien_env.py:1111-1121)
        self.sets_target_qpos = any(
            c.sets_target_qpos for c in self.controllers.values()
        )
        self.sets_target_qvel = any(
            c.sets_target_qvel for c in self.controllers.values()
        )
        self._initialize_action_space()

    def _initialize_action_space(self):
        self._action_space = gym.spaces.Dict(
            {uid: c.action_space for uid, c in self.controllers.items()}
        )

    @property
    def action_space(self):
        return self._action_space

    def set_drive_property(self):
        for c in self.controllers.values():
            c.set_drive_property()

    def reset(self):
        for c in self.controllers.values():
            c.reset()

    def set_action(self, action: Dict):
        for uid, c in self.controllers.items():
            c.set_action(action[uid])

    def before_simulation_step(self, data, substep):
        for c in self.controllers.values():
            data = c.before_simulation_step(data, substep)
        return data

    def get_state(self):
        return {uid: c.get_state() for uid, c in self.controllers.items()}

    def set_state(self, state):
        for uid, c in self.controllers.items():
            c.set_state(state.get(uid, {}))


class CombinedController(DictController):
    """DictController with a single flat Box action space
    (base_controller.py:308-347)."""

    def _initialize_action_space(self):
        lows, highs = [], []
        self.action_mapping = {}
        start = 0
        for uid, c in self.controllers.items():
            space = c.action_space
            n = space.shape[0]
            lows.append(space.low)
            highs.append(space.high)
            self.action_mapping[uid] = (start, start + n)
            start += n
        self._action_space = gym.spaces.Box(
            np.concatenate(lows), np.concatenate(highs), dtype=np.float32
        )

    def set_action(self, action: jax.Array):
        for uid, c in self.controllers.items():
            lo, hi = self.action_mapping[uid]
            c.set_action(action[..., lo:hi])

    def to_action_dict(self, action: jax.Array) -> Dict:
        return {
            uid: action[..., lo:hi] for uid, (lo, hi) in self.action_mapping.items()
        }

    def from_action_dict(self, action_dict: Dict) -> jax.Array:
        return jnp.concatenate([action_dict[uid] for uid in self.controllers], axis=-1)

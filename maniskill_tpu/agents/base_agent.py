"""BaseAgent: robot wrapper (counterpart of mani_skill/agents/base_agent.py).

An agent owns one Articulation plus a registry of controller configs keyed by
control mode (base_agent.py:46-288 parity). Robots are defined either by a
procedural ``build_description()`` (LinkSpec list) or a URDF/MJCF path.
"""
from __future__ import annotations

import dataclasses
from typing import TYPE_CHECKING, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..structs.articulation import Articulation
from ..structs.pose import Pose
from .controllers import (
    BaseController,
    CombinedController,
    DictController,
)

if TYPE_CHECKING:
    from ..envs.scene import ManiSkillScene


@dataclasses.dataclass
class Keyframe:
    """Named rest configuration (base_agent.py:36-43 parity)."""

    pose: np.ndarray  # (7,) root pose
    qpos: Optional[np.ndarray] = None
    qvel: Optional[np.ndarray] = None


class BaseAgent:
    uid: str = "base_agent"
    urdf_path: Optional[str] = None
    mjcf_path: Optional[str] = None
    urdf_config: dict = {}
    fix_root_link: bool = True
    disable_self_collisions: bool = False
    keyframes: Dict[str, Keyframe] = {}

    def __init__(
        self,
        scene: "ManiSkillScene",
        control_mode: Optional[str] = None,
        agent_idx: Optional[int] = None,
        initial_pose=None,
    ):
        self.scene = scene
        self._agent_idx = agent_idx
        self.robot: Optional[Articulation] = None
        self._requested_control_mode = control_mode
        self.controller: Optional[BaseController] = None
        self.controllers: Dict[str, BaseController] = {}
        self._load_articulation(initial_pose)
        self._after_loading_articulation()

    # -- loading ---------------------------------------------------------
    @property
    def name(self) -> str:
        if self._agent_idx is not None:
            return f"{self.uid}-{self._agent_idx}"
        return self.uid

    def _load_articulation(self, initial_pose=None):
        """Build the robot articulation. Default: from urdf_path or
        build_description()."""
        if self.urdf_path is not None:
            loader = self.scene.create_urdf_loader()
            loader.name = self.name
            loader.fix_root_link = self.fix_root_link
            loader.disable_self_collisions = self.disable_self_collisions
            self.robot = loader.load(
                self.urdf_path, initial_pose=_pose7(initial_pose)
            )
        else:
            builder = self.build_description()
            builder.fix_root_link = self.fix_root_link
            builder.disable_self_collisions = self.disable_self_collisions
            if initial_pose is not None:
                builder.set_initial_pose(_pose7(initial_pose))
            self.robot = builder.build(self.name)

    def build_description(self):
        raise NotImplementedError(
            f"{type(self).__name__} must define urdf_path or build_description()"
        )

    def _after_loading_articulation(self):
        pass

    def _after_init(self):
        pass

    # -- controllers -----------------------------------------------------
    @property
    def _controller_configs(self) -> Dict[str, object]:
        raise NotImplementedError

    @property
    def supported_control_modes(self):
        return list(self._controller_configs.keys())

    def _setup_controllers(self):
        """Instantiate the active controller (called after scene.finalize)."""
        mode = self._requested_control_mode or self.supported_control_modes[0]
        self.set_control_mode(mode)
        self._after_init()

    def set_control_mode(self, control_mode: str):
        configs = self._controller_configs[control_mode]
        balance_passive_force = True
        if isinstance(configs, dict):
            configs = dict(configs)
            balance_passive_force = configs.pop("balance_passive_force", True)
            controller = CombinedController(configs, self.robot, self.scene)
        else:
            controller = configs.controller_cls(configs, self.robot, self.scene)
        controller.set_drive_property()
        if balance_passive_force:
            # the reference disables gravity on all robot links
            # (base_agent.py:278-284); here a per-body mask in the dynamics
            import numpy as _np
            import jax.numpy as _jnp

            from ..physics.types import HArray

            m = self.scene.model
            # read/update the host mirror — never pull the device array
            # during scene construction
            src = (
                m.host_body_gravcomp
                if m.host_body_gravcomp is not None
                else m.body_gravcomp
            )
            gc = _np.asarray(src, _np.float32).copy()
            gc[[l.body_id for l in self.robot.links]] = 1.0
            self.scene.model = m.replace(
                body_gravcomp=_jnp.asarray(gc), host_body_gravcomp=HArray(gc)
            )
        self.controllers[control_mode] = controller
        self.controller = controller
        self.control_mode = control_mode

    @property
    def action_space(self):
        return self.controller.action_space

    @property
    def single_action_space(self):
        return self.controller.action_space

    def set_action(self, action):
        self.controller.set_action(action)

    def before_simulation_step(self, data, substep):
        return self.controller.before_simulation_step(data, substep)

    # -- state -----------------------------------------------------------
    def get_proprioception(self) -> Dict:
        """qpos + qvel (+ controller state), base_agent.py:339-347 parity."""
        obs = dict(qpos=self.robot.qpos, qvel=self.robot.qvel)
        ctrl_state = self.controller.get_state()
        if ctrl_state:
            from ..utils.common import flatten_dict_keys

            obs["controller"] = ctrl_state
        return obs

    def reset(self, init_qpos=None):
        """Set joint positions (masked) and zero velocities."""
        if init_qpos is not None:
            self.robot.set_qpos(init_qpos)
        self.robot.set_qvel(jnp.zeros((self.scene.num_envs, self.robot.dof), jnp.float32))
        self.controller.reset()

    def get_state(self) -> Dict:
        return dict(robot=self.robot.get_state(), controller=self.controller.get_state())

    def set_state(self, state: Dict):
        self.robot.set_state(state["robot"])
        self.controller.set_state(state.get("controller", {}))

    # -- task helpers (overridden by robots) -----------------------------
    def is_grasping(self, object=None):
        raise NotImplementedError

    def is_static(self, threshold: float = 0.2):
        return jnp.max(jnp.abs(self.robot.qvel), axis=1) <= threshold


def _pose7(pose):
    if pose is None:
        return None
    if isinstance(pose, Pose):
        raw = np.asarray(pose.raw_pose, np.float64)
        return raw[0] if raw.ndim > 1 else raw
    return np.asarray(pose, np.float64)


class MultiAgent:
    """Dict action spaces keyed by agent name (multi_agent.py:12-106 parity)."""

    def __init__(self, agents):
        self.agents = agents
        self.agents_dict = {a.name: a for a in agents}

    @property
    def action_space(self):
        import gymnasium as gym

        return gym.spaces.Dict({a.name: a.action_space for a in self.agents})

    @property
    def single_action_space(self):
        return self.action_space

    def set_action(self, action):
        for a in self.agents:
            a.set_action(action[a.name])

    def before_simulation_step(self, data, substep):
        for a in self.agents:
            data = a.before_simulation_step(data, substep)
        return data

    def get_proprioception(self):
        return {a.name: a.get_proprioception() for a in self.agents}

    def reset(self, init_qpos=None):
        for a in self.agents:
            a.reset()

    def get_state(self):
        return {a.name: a.get_state() for a in self.agents}

    def set_state(self, state):
        for a in self.agents:
            a.set_state(state[a.name])

    def _setup_controllers(self):
        for a in self.agents:
            a._setup_controllers()

    @property
    def controller(self):
        """Fan-out view over the per-agent controllers (reset/get/set state),
        so env code can treat MultiAgent like a single agent."""

        class _FanOut:
            def __init__(self, agents):
                self._agents = agents

            def reset(self):
                for a in self._agents:
                    a.controller.reset()

            def get_state(self):
                return {a.name: a.controller.get_state() for a in self._agents}

            def set_state(self, state):
                for a in self._agents:
                    a.controller.set_state(state.get(a.name, {}))

        return _FanOut(self.agents)

    @property
    def robot(self):
        return self.agents[0].robot

    @property
    def control_mode(self):
        return {a.name: a.control_mode for a in self.agents}

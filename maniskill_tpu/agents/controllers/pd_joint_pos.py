"""PD joint position controllers.

Counterpart of mani_skill/agents/controllers/pd_joint_pos.py (:15-259):
delta/absolute targets, ``use_target`` (integrate deltas on the previous
target), mimic-joint variant. Targets are stored in Data.drive_target so they
persist across steps and are partial-reset-masked automatically.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Union

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from .base_controller import BaseController, ControllerConfig


@dataclasses.dataclass
class PDJointPosControllerConfig(ControllerConfig):
    joint_names: List[str] = None
    lower: Union[None, float, Sequence[float]] = None
    upper: Union[None, float, Sequence[float]] = None
    stiffness: Union[float, Sequence[float]] = 100.0
    damping: Union[float, Sequence[float]] = 10.0
    force_limit: Union[float, Sequence[float]] = 1e10
    friction: Union[float, Sequence[float]] = 0.0
    use_delta: bool = False
    use_target: bool = False
    interpolate: bool = False
    normalize_action: bool = True
    drive_mode: str = "force"

    @property
    def controller_cls(self):
        return PDJointPosController


class PDJointPosController(BaseController):
    sets_target_qpos = True

    config: PDJointPosControllerConfig

    def _initialize_action_space(self):
        n = len(self.config.joint_names)
        if self.config.use_delta:
            lo = np.broadcast_to(np.asarray(self.config.lower, np.float32), (n,))
            hi = np.broadcast_to(np.asarray(self.config.upper, np.float32), (n,))
        else:
            # absolute mode: limits come from joint limits unless overridden
            if self.config.lower is not None:
                lo = np.broadcast_to(np.asarray(self.config.lower, np.float32), (n,))
                hi = np.broadcast_to(np.asarray(self.config.upper, np.float32), (n,))
            else:
                lims = self._joint_limits()
                lo, hi = lims[:, 0], lims[:, 1]
        # host numpy: action-space limits are trace-time constants; never
        # touch the device during controller construction
        self._lo, self._hi = np.asarray(lo), np.asarray(hi)
        if self.config.normalize_action:
            self._action_space = gym.spaces.Box(-1.0, 1.0, (n,), np.float32)
        else:
            self._action_space = gym.spaces.Box(lo, hi, dtype=np.float32)

    def _joint_limits(self) -> np.ndarray:
        m = self.scene.model
        src = m.host_dof_limit if m.host_dof_limit is not None else m.dof_limit
        lims = np.stack([np.asarray(src)[j.dof_adr] for j in self.joints])
        return np.clip(lims, -1e4, 1e4).astype(np.float32)

    def set_drive_property(self):
        n = len(self.joints)
        kp = np.broadcast_to(np.asarray(self.config.stiffness, np.float32), (n,))
        kd = np.broadcast_to(np.asarray(self.config.damping, np.float32), (n,))
        fl = np.broadcast_to(np.asarray(self.config.force_limit, np.float32), (n,))
        self.scene.set_drive_properties(self.dof_adrs, kp, kd, fl)

    def reset(self):
        """Reset targets to the current joint positions (masked by reset mask),
        mirroring pd_joint_pos.py:54-69."""
        d = self.scene.data
        cur_q = d.qpos[:, self.q_adrs]
        new_t = self.scene.masked(cur_q, d.drive_target[:, self.dof_adrs])
        self.scene.data = d.replace(
            drive_target=d.drive_target.at[:, self.dof_adrs].set(new_t)
        )

    def _target_qpos(self) -> jax.Array:
        return self.scene.data.drive_target[:, self.dof_adrs]

    def _set_target(self, t: jax.Array):
        d = self.scene.data
        self.scene.data = d.replace(
            drive_target=d.drive_target.at[:, self.dof_adrs].set(t)
        )

    def set_action(self, action: jax.Array):
        action = jnp.asarray(action, jnp.float32)
        if self.config.normalize_action:
            action = self._clip_and_scale_action(action, self._lo, self._hi)
        if self.config.use_delta:
            base = (
                self._target_qpos()
                if self.config.use_target
                else self.scene.data.qpos[:, self.q_adrs]
            )
            target = base + action
        else:
            target = jnp.broadcast_to(action, (self.scene.num_envs, len(self.joints)))
        # clamp into joint limits
        lims = self._joint_limits()
        target = jnp.clip(target, lims[:, 0], lims[:, 1])
        if self.config.interpolate:
            # per-sim-step linear interpolation from the current position to
            # the commanded target (pd_joint_pos.py:95-101): stash the
            # endpoints for before_simulation_step (same-trace values)
            self._interp_start = self.scene.data.qpos[:, self.q_adrs]
            self._interp_final = target
            target = self._interp_start  # substep 0 applies the first step
        self._set_target(target)

    def before_simulation_step(self, data, substep):
        if not self.config.interpolate or not hasattr(self, "_interp_final"):
            return data
        n = getattr(self.scene, "sim_steps_per_control", 1)
        frac = (jnp.asarray(substep, jnp.float32) + 1.0) / float(n)
        t = self._interp_start + (self._interp_final - self._interp_start) * frac
        return data.replace(
            drive_target=data.drive_target.at[:, self.dof_adrs].set(t)
        )

    def get_state(self):
        return {"target_qpos": self._target_qpos()}

    def set_state(self, state):
        if "target_qpos" in state:
            self._set_target(jnp.asarray(state["target_qpos"], jnp.float32))


@dataclasses.dataclass
class PDJointPosMimicControllerConfig(PDJointPosControllerConfig):
    """One commanded value drives several mimicking joints
    (pd_joint_pos.py:129-259). ``mimic`` maps follower joint -> (leader joint,
    multiplier, offset); default: all joints mimic the first."""

    mimic: Optional[dict] = None

    @property
    def controller_cls(self):
        return PDJointPosMimicController


class PDJointPosMimicController(PDJointPosController):
    def _mimic_tables(self):
        """Static (leader_index, multiplier, offset) per joint.

        Without an explicit ``mimic`` map every joint mimics the first joint
        1:1 (two-finger grippers). With a map, followers take
        ``mult * leader + offset`` (e.g. the ability hand's q2 linkage).
        """
        names = list(self.config.joint_names)
        mimic = self.config.mimic or {
            n: dict(joint=names[0], multiplier=1.0, offset=0.0)
            for n in names[1:]
        }
        leaders = [n for n in names if n not in mimic]
        lidx = np.zeros(len(names), np.int32)
        mult = np.ones(len(names), np.float32)
        off = np.zeros(len(names), np.float32)
        for i, n in enumerate(names):
            if n in mimic:
                spec = mimic[n]
                lidx[i] = leaders.index(spec["joint"])
                mult[i] = spec.get("multiplier", 1.0)
                off[i] = spec.get("offset", 0.0)
            else:
                lidx[i] = leaders.index(n)
        return leaders, lidx, mult, off

    def _initialize_action_space(self):
        # action dim = number of leader (non-mimicking) joints
        super()._initialize_action_space()
        leaders, self._lidx, self._mult, self._off = self._mimic_tables()
        names = list(self.config.joint_names)
        keep = np.asarray([names.index(n) for n in leaders], np.int64)
        self._lo = np.asarray(self._lo)[keep]
        self._hi = np.asarray(self._hi)[keep]
        if self.config.normalize_action:
            self._action_space = gym.spaces.Box(
                -1.0, 1.0, (len(leaders),), np.float32
            )
        else:
            self._action_space = gym.spaces.Box(
                self._lo, self._hi, dtype=np.float32
            )
        self._leader_qadrs = np.asarray(self.q_adrs)[keep]

    def set_action(self, action: jax.Array):
        action = jnp.asarray(action, jnp.float32)
        if self.config.normalize_action:
            action = self._clip_and_scale_action(action, self._lo, self._hi)
        # leader targets, then linkage expansion to all joints
        leader_t = jnp.broadcast_to(
            action, (self.scene.num_envs, self._lo.shape[0])
        )
        if self.config.use_delta:
            base = (
                self.scene.data.drive_target[:, self._leader_dof_adrs()]
                if self.config.use_target
                else self.scene.data.qpos[:, self._leader_qadrs]
            )
            leader_t = base + leader_t
        target = leader_t[:, self._lidx] * self._mult + self._off
        lims = self._joint_limits()
        target = jnp.clip(target, lims[:, 0], lims[:, 1])
        self._set_target(target)

    def _leader_dof_adrs(self):
        names = list(self.config.joint_names)
        leaders, _, _, _ = self._mimic_tables()
        keep = np.asarray([names.index(n) for n in leaders], np.int64)
        return np.asarray(self.dof_adrs)[keep]

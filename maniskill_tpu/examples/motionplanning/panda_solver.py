"""Batched motion-planning solver for the Panda arm (counterpart of
mani_skill/examples/motionplanning/panda/motionplanner.py, which wraps
mplib's RRTConnect/screw planners per-env on CPU).

TPU-native twist: planning here is *batched* — damped-least-squares IK and
joint-space interpolation run for ALL envs simultaneously inside jit, so one
plan call steers the whole batch (each env toward its own per-env goal pose).
Execution drives the env's `pd_joint_pos` controller (absolute targets).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...agents.controllers.utils.kinematics import Kinematics


class PandaMotionPlanningSolver:
    OPEN = 1.0
    CLOSED = -1.0

    def __init__(self, env, joint_vel_limit: float = 1.5):
        """env must be created with control_mode='pd_joint_pos'."""
        self.env = env
        self.base = env.unwrapped
        agent = self.base.agent
        assert self.base.control_mode == "pd_joint_pos", (
            "PandaMotionPlanningSolver requires control_mode='pd_joint_pos', got "
            f"{self.base.control_mode}"
        )
        self.robot = agent.robot
        arm_joints = [f"panda_joint{i}" for i in range(1, 8)]
        self.kin = Kinematics(
            self.base.scene, self.robot, "panda_hand_tcp", arm_joints
        )
        self.q_adrs = self.kin.q_adrs
        self.joint_vel_limit = joint_vel_limit
        # gripper-less variants (panda_stick for the drawing tasks) expose an
        # arm-only action dict
        mapping = getattr(agent.controller, "action_mapping", {})
        self.has_gripper = "gripper" in mapping if mapping else True
        self.gripper_state = self.OPEN
        self.control_dt = 1.0 / self.base.control_freq
        self.elapsed_steps = 0
        self.last_info = {}

    # -- primitives --------------------------------------------------------
    def _arm_qpos(self) -> jax.Array:
        return self.robot.qpos[:, self.q_adrs]

    def _exec_targets(self, targets):
        """Step the env once with absolute arm targets + current gripper."""
        B = self.base.num_envs
        act = dict(arm=targets)
        if self.has_gripper:
            act["gripper"] = jnp.full((B, 1), self.gripper_state, jnp.float32)
        action = self.base.agent.controller.from_action_dict(act)
        obs, rew, term, trunc, info = self.env.step(action)
        self.elapsed_steps += 1
        self.last_info = info
        return obs, rew, term, trunc, info

    def follow_qpos_path(self, q_goal, max_steps: int = 100):
        """Linearly interpolate joints from current to q_goal (B, 7), with a
        per-step velocity clamp, and execute."""
        q0 = self._arm_qpos()
        dq = q_goal - q0
        n = int(
            np.ceil(
                float(jnp.max(jnp.abs(dq)))
                / (self.joint_vel_limit * self.control_dt)
            )
        )
        n = max(1, min(n, max_steps))
        result = None
        for i in range(1, n + 1):
            target = q0 + dq * (i / n)
            result = self._exec_targets(target)
        return result

    def move_to_pose(
        self,
        pose7,
        steps: Optional[int] = None,
        refine_steps: int = 0,
        arc_steps: int = 1,
    ):
        """IK to per-env target EE poses (B, 7 wxyz) then follow the joint
        path (the screw-motion analog; reference motionplanner.py:120-170).

        ``arc_steps > 1`` tracks a Cartesian arc: the pose is lerp/slerp-
        interpolated and each waypoint is IK-solved from the previous joint
        solution — large reorientations (90-degree wrist pivots) stay within
        the DLS solver's local convergence basin and inside joint limits,
        where a single far-away IK target stalls."""
        pose7 = jnp.asarray(pose7, jnp.float32)
        if pose7.ndim == 1:
            pose7 = jnp.broadcast_to(pose7, (self.base.num_envs, 7))
        result = None
        cur = self.kin.ee_pose(self.base.scene.data)
        p0, q0 = cur[:, :3], cur[:, 3:]
        p1, q1 = pose7[:, :3], pose7[:, 3:]
        # shortest-arc slerp
        dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
        q0s = jnp.where(dot < 0, -q0, q0)
        dot = jnp.abs(dot)
        theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
        sin_t = jnp.maximum(jnp.sin(theta), 1e-6)
        per = max(1, (steps or 100) // max(1, arc_steps))
        for j in range(1, arc_steps + 1):
            a = j / arc_steps
            if arc_steps == 1:
                wp = pose7
            else:
                p = p0 + (p1 - p0) * a
                w0 = jnp.sin((1 - a) * theta) / sin_t
                w1 = jnp.sin(a * theta) / sin_t
                q = w0 * q0s + w1 * q1
                q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
                wp = jnp.concatenate([p, q], axis=-1)
            q_goal = self.kin.compute_ik(wp, self._arm_qpos(), iterations=40)
            result = self.follow_qpos_path(q_goal, max_steps=per)
        for _ in range(refine_steps):
            result = self._exec_targets(q_goal)
        return result

    def open_gripper(self, steps: int = 6):
        self.gripper_state = self.OPEN
        result = None
        target = self._arm_qpos()
        for _ in range(steps):
            result = self._exec_targets(target)
        return result

    def close_gripper(self, steps: int = 6):
        self.gripper_state = self.CLOSED
        result = None
        target = self._arm_qpos()
        for _ in range(steps):
            result = self._exec_targets(target)
        return result

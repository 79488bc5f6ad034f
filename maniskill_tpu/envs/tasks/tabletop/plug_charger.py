"""PlugCharger-v1 (counterpart of
mani_skill/envs/tasks/tabletop/plug_charger.py:30-290).

A dual-peg charger must be picked up and plugged into a floating kinematic
receptacle. All geometry is boxes (charger = base + 2 pegs; receptacle = a
box with a slot built from 5 surrounding boxes), using the reference task's
published dimensions. The goal pose is *derived* from the receptacle pose in
evaluate() each step (receptacle.pose * Rz(pi)) instead of being cached at
reset — jit-friendly, no stored per-episode state.
"""
from __future__ import annotations

from typing import Union

import numpy as np
import jax
import jax.numpy as jnp

from ....sensors.camera import CameraConfig
from ....structs.pose import Pose
from ....utils.geometry import rotation_conversions as rc
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ....scene_builder.table import TableSceneBuilder
from ...base_env import BaseEnv
from ...utils import randomization


@register_env("PlugCharger-v1", max_episode_steps=200)
class PlugChargerEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda_wristcam", "panda"]
    SUPPORTED_REWARD_MODES = ("none", "sparse")

    _base_size = [2e-2, 1.5e-2, 1.2e-2]  # charger base half size
    _peg_size = [8e-3, 0.75e-3, 3.2e-3]  # charger peg half size
    _peg_gap = 7e-3
    _clearance = 5e-4
    _receptacle_size = [1e-2, 5e-2, 5e-2]

    def __init__(self, *args, robot_uids="panda_wristcam",
                 robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sim_config(self):
        from ....structs.types import SceneConfig, SimConfig

        # precision insertion task: the 0.5 mm slot clearance tolerates only
        # ~0.03 rad of charger-in-gripper rocking, so run the contact solver
        # harder than the 16-iteration default — grip torque converges and
        # the held charger stops drifting between planner measurements
        # (reference plug_charger.py relies on PhysX TGS's stiff grasp)
        return SimConfig(
            scene_config=SceneConfig(solver_position_iterations=32)
        )

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0, 0.6], target=[-0.1, 0, 0.1])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.3, 0.4, 0.1], [0, 0, 0])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([-0.615, 0, 0, 1, 0, 0, 0]))

    def _build_charger(self):
        peg, base, gap = self._peg_size, self._base_size, self._peg_gap
        b = self.scene.create_actor_builder()
        for sy in (gap, -gap):
            b.add_box_collision(
                pose=np.array([peg[0], sy, 0, 1, 0, 0, 0]), half_size=peg
            )
            b.add_box_visual(
                pose=np.array([peg[0], sy, 0, 1, 0, 0, 0]), half_size=peg,
                color=(0.8, 0.8, 0.82, 1),
            )
        b.add_box_collision(
            pose=np.array([-base[0], 0, 0, 1, 0, 0, 0]), half_size=base
        )
        b.add_box_visual(
            pose=np.array([-base[0], 0, 0, 1, 0, 0, 0]), half_size=base,
            color=(0.1, 0.1, 0.12, 1),
        )
        b.initial_pose = np.array([0, 0, self._base_size[2], 1, 0, 0, 0])
        return b.build("charger")

    def _build_receptacle(self):
        peg = [
            self._peg_size[0],
            self._peg_size[1] + self._clearance,
            self._peg_size[2] + self._clearance,
        ]
        rec, gap = self._receptacle_size, self._peg_gap
        b = self.scene.create_actor_builder()
        sy = 0.5 * (rec[1] - peg[1] - gap)
        sz = 0.5 * (rec[2] - peg[2])
        dy = peg[1] + gap + sy
        dz = peg[2] + sz
        # 4 walls around the two slots + the strip between them
        parts = [
            ((0, dy, 0), [rec[0], sy, rec[2]]),
            ((0, -dy, 0), [rec[0], sy, rec[2]]),
            ((0, 0, dz), [rec[0], gap - peg[1], sz]),
            ((0, 0, -dz), [rec[0], gap - peg[1], sz]),
            ((0, 0, 0), [rec[0], gap - peg[1], peg[2]]),
        ]
        for pos, hs in parts:
            pose = np.array([*pos, 1, 0, 0, 0], np.float64)
            b.add_box_collision(pose=pose, half_size=hs)
            b.add_box_visual(pose=pose, half_size=hs, color=(0.9, 0.9, 0.92, 1))
        b.initial_pose = np.array([0.05, 0, 0.1, 1, 0, 0, 0])
        return b.build_kinematic("receptacle")

    def _load_scene(self, options: dict):
        self.table_scene = TableSceneBuilder(
            self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.table_scene.build()
        self.charger = self._build_charger()
        self.receptacle = self._build_receptacle()

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)
        rng = self._batched_episode_rng

        # charger on the table, random yaw
        lo = np.array([-0.1, -0.2])
        hi = np.array([-0.01 - self._peg_size[0] * 2, 0.2])
        xy = rng.uniform(0.0, 1.0, (2,)) * (hi - lo) + lo
        pos = jnp.concatenate(
            [xy, jnp.full((b, 1), self._base_size[2], jnp.float32)], axis=-1
        )
        q = randomization.random_quaternions(
            rng, lock_x=True, lock_y=True, bounds=(-np.pi / 3, np.pi / 3)
        )
        self.charger.set_pose(Pose.create_from_pq(pos, q))

        # floating receptacle, slot facing the robot (yaw ~ pi)
        xy = rng.uniform(0.0, 1.0, (2,)) * jnp.asarray([0.09, 0.2]) + jnp.asarray(
            [0.01, -0.1]
        )
        pos = jnp.concatenate([xy, jnp.full((b, 1), 0.1, jnp.float32)], axis=-1)
        q = randomization.random_quaternions(
            rng, lock_x=True, lock_y=True,
            bounds=(np.pi - np.pi / 8, np.pi + np.pi / 8),
        )
        self.receptacle.set_pose(Pose.create_from_pq(pos, q))

    @property
    def goal_pose(self) -> Pose:
        """Charger pose at full insertion: receptacle frame rotated by Rz(pi)."""
        flip = jnp.asarray([0.0, 0.0, 0.0, 1.0], jnp.float32)  # wxyz Rz(pi)
        return self.receptacle.pose * Pose.create_from_pq(q=flip)

    def evaluate(self):
        goal = self.goal_pose
        obj = self.charger.pose
        dist = jnp.linalg.norm(goal.p - obj.p, axis=-1)
        dq = rc.quaternion_multiply(rc.quaternion_conjugate(goal.q), obj.q)
        ang = jnp.linalg.norm(rc.quaternion_to_axis_angle(dq), axis=-1)
        ang = jnp.minimum(ang, 2 * np.pi - ang)
        success = (dist <= 5e-3) & (ang <= 0.2)
        return dict(obj_to_goal_dist=dist, obj_to_goal_angle=ang, success=success)

    def _get_obs_extra(self, info: dict):
        obs = dict(tcp_pose=self.agent.tcp.pose.raw_pose)
        if "state" in self.obs_mode:
            obs.update(
                charger_pose=self.charger.pose.raw_pose,
                receptacle_pose=self.receptacle.pose.raw_pose,
                goal_pose=self.goal_pose.raw_pose,
            )
        return obs

"""TableTopFreeDraw-v1 (counterpart of
mani_skill/envs/tasks/drawing/draw.py:17-200).

Semantics preserved: a white canvas on the table; a stick-equipped Panda
deposits red "ink" dots wherever its tip touches the canvas (one dot per
control step, MAX_DOTS total). No success condition — a free-drawing
sandbox.

TPU-native design: the reference keeps MAX_DOTS kinematic actors and moves
one per step from Python. Here the dots are kinematic bodies whose qpos
block is updated with a batched dynamic write indexed by a per-env
``draw_step`` counter carried in the task extras — the whole mechanism
lives inside the fused jit.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....sensors.camera import CameraConfig
from ....structs.types import SceneConfig, SimConfig
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ....scene_builder.table import TableSceneBuilder
from ...base_env import BaseEnv

# dot orientation: cylinder axis -> z-up (90deg about y)
_DOT_QUAT = np.array([np.cos(np.pi / 4), 0.0, np.sin(np.pi / 4), 0.0], np.float32)


@register_env("TableTopFreeDraw-v1", max_episode_steps=1000)
class TableTopFreeDrawEnv(BaseEnv):
    MAX_DOTS = 256
    """ink budget per episode (the reference uses 1010; kept lower by
    default since every dot is a body in the fused physics state)"""
    DOT_THICKNESS = 0.003
    CANVAS_THICKNESS = 0.02
    BRUSH_RADIUS = 0.01
    BRUSH_COLORS = [[0.8, 0.2, 0.2, 1]]

    SUPPORTED_REWARD_MODES = ("none",)
    SUPPORTED_ROBOTS = ["panda_stick"]

    def __init__(self, *args, robot_uids="panda_stick", max_dots=None, **kwargs):
        if max_dots is not None:
            self.MAX_DOTS = int(max_dots)
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sim_config(self):
        return SimConfig(
            sim_freq=100,
            control_freq=20,
            scene_config=SceneConfig(
                solver_position_iterations=4, solver_velocity_iterations=0
            ),
        )

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0, 0.8], target=[0, 0, 0.1])
        return [CameraConfig("base_camera", pose, 320, 240, 1.2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at(eye=[0.3, 0, 0.8], target=[0, 0, 0.1])
        return CameraConfig("render_camera", pose, 640, 480, 1.2, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([-0.615, 0, 0, 1, 0, 0, 0]))

    def _load_scene(self, options: dict):
        self.table_scene = TableSceneBuilder(self, robot_init_qpos_noise=0)
        self.table_scene.build()

        b = self.scene.create_actor_builder()
        b.add_box_visual(
            half_size=[0.4, 0.6, self.CANVAS_THICKNESS / 2], color=[1, 1, 1, 1]
        )
        b.add_box_collision(half_size=[0.4, 0.6, self.CANVAS_THICKNESS / 2])
        b.set_initial_pose([-0.1, 0, self.CANVAS_THICKNESS / 2, 1, 0, 0, 0])
        self.canvas = b.build_static(name="canvas")

        self.dots = []
        for i in range(self.MAX_DOTS):
            db = self.scene.create_actor_builder()
            db.add_cylinder_visual(
                radius=self.BRUSH_RADIUS,
                half_length=self.DOT_THICKNESS / 2,
                color=self.BRUSH_COLORS[0],
            )
            db.set_initial_pose(
                np.concatenate([[0, 0, -self.DOT_THICKNESS], _DOT_QUAT])
            )
            self.dots.append(db.build_kinematic(name=f"dot_{i}"))
        self._dot_q0 = None  # resolved post-finalize
        self.scene.register_extra("draw_step", (), jnp.int32)

    def _after_reconfigure(self, options: dict):
        # dots are dof-less mocap markers (kinematic, no collision): their
        # poses live in Data.mocap_pose rows, not qpos
        idxs = [d._mocap_idx for d in self.dots]
        assert idxs == list(range(idxs[0], idxs[0] + len(idxs))), (
            "dot mocap rows must be contiguous"
        )
        self._dot_m0 = idxs[0]

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        self.table_scene.initialize(env_idx)
        # hide all dots inside the table
        hidden = jnp.concatenate(
            [
                jnp.asarray([0, 0, -self.DOT_THICKNESS], jnp.float32),
                jnp.asarray(_DOT_QUAT),
            ]
        )
        d = self.scene.data
        m0 = self._dot_m0
        cur = d.mocap_pose[:, m0 : m0 + self.MAX_DOTS]
        new = jnp.broadcast_to(hidden, cur.shape)
        self.scene.data = d.replace(
            mocap_pose=d.mocap_pose.at[:, m0 : m0 + self.MAX_DOTS].set(
                self.scene.masked(new, cur)
            )
        )

    def _after_control_step(self):
        scene = self.scene
        d = scene.data
        step = d.extras["draw_step"]  # (B,)
        tcp = self.agent.tcp_pose.p  # (B, 3)
        touching = tcp[:, 2] < self.CANVAS_THICKNESS + self.DOT_THICKNESS + 0.005
        dot_pos = jnp.where(
            touching[:, None],
            jnp.stack(
                [
                    tcp[:, 0],
                    tcp[:, 1],
                    jnp.full_like(tcp[:, 0], self.DOT_THICKNESS / 2 + self.CANVAS_THICKNESS),
                ],
                axis=-1,
            ),
            jnp.asarray([0, 0, -self.DOT_THICKNESS], jnp.float32)[None],
        )
        dot7 = jnp.concatenate(
            [dot_pos, jnp.broadcast_to(jnp.asarray(_DOT_QUAT), dot_pos.shape[:1] + (4,))],
            axis=-1,
        )  # (B, 7)
        idx = self._dot_m0 + jnp.minimum(step, self.MAX_DOTS - 1)

        def write_row(mrow, i, v):
            return jax.lax.dynamic_update_slice(mrow, v[None], (i, 0))

        mocap = jax.vmap(write_row)(d.mocap_pose, idx, dot7)
        scene.data = d.replace(
            mocap_pose=mocap, extras={**d.extras, "draw_step": step + 1}
        )

    def evaluate(self):
        return {}

    def _get_obs_extra(self, info: dict):
        return dict(tcp_pose=self.agent.tcp_pose.raw_pose)

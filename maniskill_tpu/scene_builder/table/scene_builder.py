"""Table scene builder (counterpart of
mani_skill/utils/scene_builder/table/scene_builder.py, 178 LoC).

Builds a ground plane + table whose top surface is exactly z=0 (tasks place
objects at z=half_size), and initializes the robot at its keyframe pose with
small qpos noise.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..scene_builder import SceneBuilder
from ...building.ground import build_ground

TABLE_HEIGHT = 0.9196429  # reference table model height


class TableSceneBuilder(SceneBuilder):
    def build(self):
        scene = self.scene
        self.ground = build_ground(scene, altitude=-TABLE_HEIGHT)
        b = scene.create_actor_builder()
        half = np.array([0.7, 0.8, 0.025])
        b.add_box_collision(
            pose=np.array([0, 0, -half[2], 1, 0, 0, 0]), half_size=half, friction=0.3
        )
        b.add_box_visual(
            pose=np.array([0, 0, -half[2], 1, 0, 0, 0]),
            half_size=half,
            color=(0.57, 0.43, 0.30, 1.0),
        )
        # wood-grain top: baked-texture grid riding just above the box face
        # (reference table GLB is UV-textured, scene_builder/table.py:41-60)
        from ...render.textures import wood

        b.add_textured_visual(
            wood(64), half[0], half[1],
            pose=np.array([0, 0, 5e-4, 1, 0, 0, 0]), res=10,
        )
        # legs are visual-only
        b.set_initial_pose(np.array([-0.12, 0, 0, 1, 0, 0, 0]))
        self.table = b.build_static("table-workspace")
        self.table_height = TABLE_HEIGHT

    def initialize(self, env_idx):
        env = self.env
        agents = getattr(env.agent, "agents", [env.agent])
        for agent in agents:
            kf = getattr(agent, "keyframes", {}).get("rest")
            if kf is not None and kf.qpos is not None:
                qpos = jnp.asarray(kf.qpos, jnp.float32)
                noise = env._batched_episode_rng.normal(
                    0.0, self.robot_init_qpos_noise, size=(len(kf.qpos),)
                )
                # keep gripper joints exactly at keyframe
                mask = np.ones(len(kf.qpos), np.float32)
                if len(mask) >= 2:
                    mask[-2:] = 0.0
                agent.reset(qpos + noise * jnp.asarray(mask))
            else:
                agent.reset()

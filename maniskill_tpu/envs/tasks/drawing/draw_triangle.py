"""DrawTriangle-v1 (counterpart of
mani_skill/envs/tasks/drawing/draw_triangle.py:21-340).

Semantics preserved: a goal triangle outline (equilateral, 0.3 side) is
placed on the canvas with random position and z-rotation; the stick robot
must trace it. Success = every one of the 153 reference points along the
triangle (51 per edge) has a drawn dot within THRESHOLD.

TPU-native: the reference keeps ``ref_dist``/``triangles`` as Python-side
torch state updated per step; here both live in the task extras pytree and
update inside the fused jit.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....structs.pose import Pose
from ....utils.registration import register_env
from ....utils.geometry import rotation_conversions as rc
from .draw import _DOT_QUAT, TableTopFreeDrawEnv

N_EDGE_PTS = 51
N_REF = 3 * N_EDGE_PTS


@register_env("DrawTriangle-v1", max_episode_steps=300)
class DrawTriangleEnv(TableTopFreeDrawEnv):
    MAX_DOTS = 300
    THRESHOLD = 0.025
    SUPPORTED_REWARD_MODES = ("sparse", "none")

    def _load_scene(self, options: dict):
        super()._load_scene(options)
        # goal triangle outline: 3 thin boxes (side 0.3, height 0.01)
        side = 0.3
        radius = (side / 2) / np.sqrt(3)
        b = self.scene.create_actor_builder()
        for k in range(3):
            theta = np.pi / 2 + 2 * np.pi * k / 3
            c = np.array([radius * np.cos(theta), radius * np.sin(theta), 0.0])
            edge_angle = theta + np.pi / 2
            quat = np.array(
                [np.cos(edge_angle / 2), 0, 0, np.sin(edge_angle / 2)]
            )
            b.add_box_visual(
                pose=np.concatenate([c, quat]),
                half_size=[side / 2, 0.005, 0.0005],
                color=[0.1, 0.1, 0.6, 1.0],
            )
        b.set_initial_pose([0, 0, 0.011, 1, 0, 0, 0])
        self.goal_tri = b.build_kinematic(name="goal_tri")
        self._hidden_objects = [o for o in self._hidden_objects]  # keep visible

        # equilateral triangle vertices in the goal frame
        verts = []
        for k in range(3):
            theta = np.pi / 2 + 2 * np.pi * k / 3
            verts.append(
                [2 * radius * np.cos(theta), 2 * radius * np.sin(theta), 0.0]
            )
        self.original_verts = np.asarray(verts, np.float32)

        self.scene.register_extra("tri_points", (N_REF, 2))
        self.scene.register_extra("tri_verts", (3, 3))
        self.scene.register_extra("ref_hit", (N_REF,), jnp.bool_)

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        super()._initialize_episode(env_idx, options)
        b = self.num_envs
        rng = self._batched_episode_rng
        target_xy = rng.uniform(0.0, 0.02, (2,)) - 0.1
        target = jnp.concatenate(
            [target_xy, jnp.full((b, 1), 0.011, jnp.float32)], axis=-1
        )
        qs = rng.quaternions(lock_x=True, lock_y=True)
        self.goal_tri.set_pose(Pose.create_from_pq(target, qs))

        mats = rc.quaternion_to_matrix(qs)  # (B, 3, 3)
        verts = jnp.einsum(
            "bij,vj->bvi", mats, jnp.asarray(self.original_verts)
        ) + target[:, None, :]  # (B, 3, 3)
        self.scene.set_extra("tri_verts", verts)
        # 51 points per edge
        t = jnp.linspace(0.0, 1.0, N_EDGE_PTS, dtype=jnp.float32)
        pts = []
        for i in range(3):
            a = verts[:, i, :2]
            c = verts[:, (i + 1) % 3, :2]
            pts.append(a[:, None] * (1 - t)[None, :, None] + c[:, None] * t[None, :, None])
        tri_points = jnp.concatenate(pts, axis=1)  # (B, 153, 2)
        self.scene.set_extra("tri_points", tri_points)
        self.scene.set_extra("ref_hit", jnp.zeros((b, N_REF), bool))

    def _after_control_step(self):
        super()._after_control_step()
        scene = self.scene
        d = scene.data
        tcp = self.agent.tcp_pose.p
        touching = tcp[:, 2] < self.CANVAS_THICKNESS + self.DOT_THICKNESS + 0.005
        dist = jnp.linalg.norm(
            tcp[:, None, :2] - d.extras["tri_points"], axis=-1
        )  # (B, 153)
        hit = d.extras["ref_hit"] | (touching[:, None] & (dist < self.THRESHOLD))
        scene.data = d.replace(extras={**scene.data.extras, "ref_hit": hit})

    def evaluate(self):
        return {"success": self.scene.data.extras["ref_hit"].all(axis=-1)}

    def compute_sparse_reward(self, obs, action, info):
        return info["success"].astype(jnp.float32)

    def _get_obs_extra(self, info: dict):
        obs = dict(tcp_pose=self.agent.tcp_pose.raw_pose)
        if "state" in self.obs_mode:
            verts = self.scene.data.extras["tri_verts"]
            obs.update(
                goal_pose=self.goal_tri.pose.raw_pose,
                tcp_to_verts_pos=(
                    verts - self.agent.tcp_pose.p[:, None]
                ).reshape(self.num_envs, -1),
                goal_pos=self.goal_tri.pose.p,
                vertices=verts.reshape(self.num_envs, -1),
            )
        return obs

"""ReplicaCAD scene builder (counterpart of
mani_skill/utils/scene_builder/replicacad/scene_builder.py).

Two asset paths:
- With the ReplicaCAD download (``python -m maniskill_tpu.utils.download_asset
  ReplicaCAD``): loads ``configs/scenes/*.scene_instance.json``, cooking
  each referenced GLB into convex-hull colliders + visual meshes.
- Without assets: a procedural apartment of the same scale — floor, walls,
  kitchen counter, dining table, sofa, shelf, and a few dynamic props —
  so SceneManipulation-v1 and mobile-robot exploration run out of the box.
"""
from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from ...utils.assets import ASSET_DIR
from ...utils.logging_utils import logger
from ..registration import register_scene_builder
from ..scene_builder import SceneBuilder

REPLICA_DIR = ASSET_DIR / "scene_datasets" / "replica_cad_dataset"


@register_scene_builder("ReplicaCAD")
class ReplicaCADSceneBuilder(SceneBuilder):
    builds_lighting = False
    robot_initial_pose = np.array([-1.0, 0, 0.02, 1, 0, 0, 0])

    def __init__(self, env, robot_init_qpos_noise: float = 0.02):
        super().__init__(env, robot_init_qpos_noise)
        self.build_configs: Optional[List[str]] = None
        scenes_dir = REPLICA_DIR / "configs" / "scenes"
        if scenes_dir.exists():
            self.build_configs = sorted(
                f for f in os.listdir(scenes_dir) if f.endswith(".json")
            )
        self._movable: List = []

    # ------------------------------------------------------------------
    def build(self, build_config_idxs: Optional[List[int]] = None):
        if self.build_configs:
            try:
                idx = (build_config_idxs or [0])[0]
                return self._build_from_dataset(self.build_configs[idx])
            except Exception as e:
                logger.warning(
                    "ReplicaCAD dataset build failed (%s); procedural fallback", e
                )
        return self._build_procedural()

    def _build_from_dataset(self, config_name: str):
        from ...building.cooking import decompose_mesh
        from ...utils.geometry.mesh_io import decimate, load_mesh

        with open(REPLICA_DIR / "configs" / "scenes" / config_name) as f:
            cfg = json.load(f)
        scene = self.scene
        from ...building.ground import build_ground

        build_ground(scene)
        # static stage
        stage_name = cfg["stage_instance"]["template_name"].split("/")[-1]
        stage_glb = REPLICA_DIR / "stages" / f"{stage_name}.glb"
        v, fcs = load_mesh(str(stage_glb))
        b = scene.create_actor_builder()
        b.add_multiple_convex_collisions_from_mesh(v, fcs, max_parts=16)
        vv, vf = decimate(v, fcs, 5000)
        b.add_visual_from_mesh(vv, vf, color=[0.8, 0.8, 0.75, 1])
        # ReplicaCAD stages are y-up; rotate to z-up
        b.set_initial_pose([0, 0, 0, 0.7071068, 0.7071068, 0, 0])
        b.build_static(name="stage")
        # objects
        for i, obj in enumerate(cfg.get("object_instances", [])[:40]):
            tname = obj["template_name"].split("/")[-1]
            glb = REPLICA_DIR / "objects" / f"{tname}.glb"
            if not glb.exists():
                continue
            ov, of = load_mesh(str(glb))
            ob = scene.create_actor_builder()
            ob.add_multiple_convex_collisions_from_mesh(
                ov, of, max_parts=4, color=[0.7, 0.65, 0.6, 1]
            )
            t = obj.get("translation", [0, 0, 0])
            r = obj.get("rotation", [1, 0, 0, 0])
            # y-up -> z-up
            pos = [t[0], -t[2], t[1]]
            ob.set_initial_pose(np.asarray(pos + list(r), np.float64))
            motion = obj.get("motion_type", "STATIC").upper()
            name = f"obj_{i}_{tname}"
            actor = (
                ob.build(name=name)
                if motion == "DYNAMIC"
                else ob.build_static(name=name)
            )
            if motion == "DYNAMIC":
                self._movable.append((actor, np.asarray(pos + list(r), np.float32)))

    def _build_procedural(self):
        from ...building.ground import build_ground

        scene = self.scene
        build_ground(scene)
        wall_c = (0.85, 0.83, 0.8, 1)
        wood = (0.54, 0.39, 0.27, 1)

        def sbox(name, pos, half, color=wall_c):
            b = scene.create_actor_builder()
            b.add_box_collision(half_size=half)
            b.add_box_visual(half_size=half, color=color)
            b.set_initial_pose(np.array(list(pos) + [1, 0, 0, 0], np.float64))
            return b.build_static(name=name)

        # 8m x 6m room
        W, D, H, T = 4.0, 3.0, 1.4, 0.06
        sbox("wall_n", (0, D, H), (W, T, H))
        sbox("wall_s", (0, -D, H), (W, T, H))
        sbox("wall_e", (W, 0, H), (T, D, H))
        sbox("wall_w", (-W, 0, H), (T, D, H))
        # kitchen counter along the north wall
        sbox("counter", (1.5, D - 0.45, 0.45), (1.6, 0.4, 0.45), wood)
        # dining table + sofa + shelf
        sbox("table_top", (0.0, 0.0, 0.74), (0.7, 0.5, 0.02), wood)
        for i, (sx, sy) in enumerate([(-1, -1), (-1, 1), (1, -1), (1, 1)]):
            sbox(f"table_leg_{i}", (0.62 * sx, 0.42 * sy, 0.36), (0.04, 0.04, 0.36), wood)
        sbox("sofa_seat", (-2.5, -1.8, 0.25), (1.0, 0.45, 0.25), (0.35, 0.35, 0.5, 1))
        sbox("sofa_back", (-2.5, -2.2, 0.65), (1.0, 0.1, 0.25), (0.35, 0.35, 0.5, 1))
        sbox("shelf", (3.5, 1.5, 0.9), (0.25, 0.8, 0.9), wood)

        # dynamic props: a few graspable objects on surfaces
        props = [
            ("prop_cube", (0.1, 0.1, 0.78), 0.025, (0.9, 0.2, 0.2, 1)),
            ("prop_cube2", (-0.3, -0.2, 0.78), 0.025, (0.2, 0.6, 0.9, 1)),
            ("prop_counter", (1.2, 2.35, 0.93), 0.03, (0.2, 0.8, 0.3, 1)),
        ]
        for name, pos, half, color in props:
            b = scene.create_actor_builder()
            b.add_box_collision(half_size=[half] * 3)
            b.add_box_visual(half_size=[half] * 3, color=color)
            b.set_initial_pose(np.array(list(pos) + [1, 0, 0, 0], np.float64))
            actor = b.build(name=name)
            self._movable.append(
                (actor, np.asarray(list(pos) + [1, 0, 0, 0], np.float32))
            )

    # ------------------------------------------------------------------
    def initialize(self, env_idx, init_config_idxs: Optional[List[int]] = None):
        env = self.env
        agents = getattr(env.agent, "agents", [env.agent])
        for agent in agents:
            kf = getattr(agent, "keyframes", {}).get("rest")
            if kf is not None and kf.qpos is not None:
                agent.reset(jnp.asarray(kf.qpos, jnp.float32))
            else:
                agent.reset()
        from ...structs.pose import Pose

        for actor, pose in self._movable:
            actor.set_pose(Pose.create(jnp.asarray(pose)))
            actor.set_linear_velocity(jnp.zeros((env.num_envs, 3)))
            actor.set_angular_velocity(jnp.zeros((env.num_envs, 3)))

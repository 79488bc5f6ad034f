"""Camera sensor (counterpart of mani_skill/sensors/camera.py:31-294).

``CameraConfig`` mirrors the reference's fields (uid/pose/width/height/fov |
intrinsic/near/far/mount/shader_pack). ``Camera.get_obs`` renders the
requested modalities with the batched rasterizer and applies the reference's
"minimal" shader texture contract: rgb uint8, depth int16 millimeters,
segmentation int16, position int16 millimeters in the OpenGL camera frame
(render/shaders.py:70-88 parity).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..render.rasterizer import SceneMesh, perspective_matrix, rasterize
from ..structs.pose import Pose
from ..structs.actor import Actor
from ..structs.link import Link
from ..utils.geometry import rotation_conversions as rc
from ..utils.scene_utils import ROS_TO_CV, ROS_TO_GL


@dataclasses.dataclass
class CameraConfig:
    uid: str
    pose: Union[Pose, np.ndarray]
    width: int = 128
    height: int = 128
    fov: Optional[float] = None  # vertical fov (rad)
    near: float = 0.01
    far: float = 100.0
    intrinsic: Optional[np.ndarray] = None
    mount: Optional[Union[Actor, Link]] = None
    shader_pack: str = "minimal"

    def __post_init__(self):
        if isinstance(self.pose, Pose):
            raw = np.asarray(self.pose.raw_pose, np.float64)
            self.pose = raw[0] if raw.ndim > 1 else raw
        else:
            self.pose = np.asarray(self.pose, np.float64)


def parse_camera_configs(configs) -> Dict[str, CameraConfig]:
    if configs is None:
        return {}
    if isinstance(configs, CameraConfig):
        return {configs.uid: configs}
    if isinstance(configs, dict):
        return dict(configs)
    return {c.uid: c for c in configs}


def update_camera_configs_from_dict(configs: Dict[str, CameraConfig], overrides: dict):
    """Per-camera or global config overrides (camera.py:70-112 parity)."""
    if not overrides:
        return
    global_keys = {k: v for k, v in overrides.items() if not isinstance(v, dict)}
    for cfg in configs.values():
        for k, v in global_keys.items():
            setattr(cfg, k, v)
    for name, sub in overrides.items():
        if isinstance(sub, dict) and name in configs:
            for k, v in sub.items():
                setattr(configs[name], k, v)


class Camera:
    def __init__(self, config: CameraConfig, scene):
        self.config = config
        self.scene = scene
        H, W = config.height, config.width
        if config.intrinsic is not None:
            K = np.asarray(config.intrinsic, np.float64)
            self.fx, self.fy = K[0, 0], K[1, 1]
            self.cx, self.cy = K[0, 2], K[1, 2]
            fov = 2 * np.arctan(H / (2 * self.fy))
        else:
            fov = config.fov if config.fov is not None else np.pi / 2
            self.fy = self.fx = H / (2 * np.tan(fov / 2))
            self.cx, self.cy = W / 2, H / 2
        self.fov = fov
        self.proj = jnp.asarray(
            perspective_matrix(fov, W / H, config.near, config.far), jnp.float32
        )
        self._mesh_cache: Dict[tuple, SceneMesh] = {}

    # -- pose ------------------------------------------------------------
    def world_pose(self) -> Pose:
        """Camera pose in world (ROS convention: +x forward), per env."""
        local = Pose.create(jnp.asarray(self.config.pose, jnp.float32))
        if self.config.mount is not None:
            return self.config.mount.pose * local
        B = self.scene.num_envs
        return Pose(jnp.broadcast_to(local.raw_pose, (B, 7)))

    def _view_matrix(self) -> jax.Array:
        """(B, 4, 4) world -> OpenGL camera."""
        pose = self.world_pose()
        inv = pose.inv()
        R = rc.quaternion_to_matrix(inv.q)  # (B, 3, 3) world->ros cam
        t = inv.p
        gl = jnp.asarray(ROS_TO_GL, jnp.float32)
        Rg = jnp.einsum("ij,bjk->bik", gl, R)
        tg = jnp.einsum("ij,bj->bi", gl, t)
        B = Rg.shape[0]
        m = jnp.zeros((B, 4, 4), jnp.float32)
        m = m.at[:, :3, :3].set(Rg).at[:, :3, 3].set(tg).at[:, 3, 3].set(1.0)
        return m

    # -- rendering -------------------------------------------------------
    def _get_mesh(self, hidden_actors: Sequence = ()) -> SceneMesh:
        exclude = tuple(sorted(a.body_id for a in hidden_actors))
        if exclude not in self._mesh_cache:
            self._mesh_cache[exclude] = SceneMesh.build(
                self.scene.model, self.scene, exclude_body_ids=set(exclude)
            )
        return self._mesh_cache[exclude]

    def capture(self, hidden_actors: Sequence = (), want_normal=False,
                want_albedo=False):
        from ..physics.kinematics import geom_poses

        mesh = self._get_mesh(hidden_actors)
        gpos, gquat = geom_poses(self.scene.model, self.scene.data)
        wv = mesh.world_vertices(gpos, gquat)
        pack = self.config.shader_pack
        if pack.startswith("rt"):
            # ray-traced shader packs (reference render/shaders.py:103-135)
            from ..render.pathtracer import RT_PACKS, pathtrace

            cfg = RT_PACKS.get(pack, RT_PACKS["rt-fast"])
            pose = self.world_pose()
            gl = jnp.asarray(ROS_TO_GL.T, jnp.float32)  # gl cam -> ros cam
            rot = jnp.einsum(
                "bij,jk->bik", rc.quaternion_to_matrix(pose.q), gl
            )  # gl cam -> world
            return mesh, pathtrace(
                mesh, wv, pose.p, rot,
                self.fx, self.fy, self.cx, self.cy,
                self.config.height, self.config.width,
                spp=cfg["spp"], bounces=cfg["bounces"],
                denoise=cfg["denoise"], lights=self.scene.lights,
                key=self.scene.render_key(),
            )
        return mesh, rasterize(
            mesh,
            wv,
            self._view_matrix(),
            self.proj,
            self.config.height,
            self.config.width,
            lights=self.scene.lights,
            want_normal=want_normal,
            want_albedo=want_albedo,
        )

    def get_obs(
        self,
        rgb: bool = True,
        depth: bool = False,
        segmentation: bool = False,
        position: bool = False,
        normal: bool = False,
        albedo: bool = False,
        apply_texture_transforms: bool = True,
        hidden_actors: Sequence = (),
    ) -> Dict[str, jax.Array]:
        mesh, buf = self.capture(
            hidden_actors, want_normal=normal, want_albedo=albedo
        )
        out = {}
        if rgb:
            out["rgb"] = (jnp.clip(buf["color"], 0, 1) * 255).astype(jnp.uint8)
        if depth:
            # int16 millimeters ("minimal" shader contract)
            out["depth"] = (
                jnp.clip(buf["depth"] * 1000.0, 0, 32767).astype(jnp.int16)[..., None]
            )
        if segmentation:
            out["segmentation"] = buf["seg"].astype(jnp.int16)[..., None]
        if position:
            H, W = self.config.height, self.config.width
            z = buf["depth"]  # (B, H, W) meters, 0 = background
            xs = (jnp.arange(W, dtype=jnp.float32) + 0.5 - self.cx) / self.fx
            ys = (jnp.arange(H, dtype=jnp.float32) + 0.5 - self.cy) / self.fy
            x = xs[None, None, :] * z
            y = -ys[None, :, None] * z
            pos = jnp.stack([x, y, -z], axis=-1)  # OpenGL cam frame
            out["position"] = jnp.clip(pos * 1000.0, -32767, 32767).astype(jnp.int16)
            out["position_valid"] = buf["valid"]
        if normal:
            # world-space unit normals, float32 ("default" shader contract)
            out["normal"] = buf["normal"]
        if albedo:
            out["albedo"] = (jnp.clip(buf["albedo"], 0, 1) * 255).astype(jnp.uint8)
        return out

    def get_params(self) -> Dict[str, jax.Array]:
        """extrinsic_cv / cam2world_gl / intrinsic_cv (camera.py:248-253)."""
        pose = self.world_pose()
        B = pose.raw_pose.shape[0]
        R = rc.quaternion_to_matrix(pose.q)  # ros cam -> world
        gl = jnp.asarray(ROS_TO_GL.T, jnp.float32)  # gl cam -> ros cam
        Rg = jnp.einsum("bij,jk->bik", R, gl)
        c2w = jnp.zeros((B, 4, 4), jnp.float32)
        c2w = c2w.at[:, :3, :3].set(Rg).at[:, :3, 3].set(pose.p).at[:, 3, 3].set(1.0)

        cv = jnp.asarray(ROS_TO_CV, jnp.float32)
        inv = pose.inv()
        Rw = jnp.einsum("ij,bjk->bik", cv, rc.quaternion_to_matrix(inv.q))
        tw = jnp.einsum("ij,bj->bi", cv, inv.p)
        extrinsic = jnp.concatenate([Rw, tw[..., None]], axis=-1)  # (B, 3, 4)

        K = jnp.asarray(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], jnp.float32
        )
        return dict(
            extrinsic_cv=extrinsic,
            cam2world_gl=c2w,
            intrinsic_cv=jnp.broadcast_to(K, (B, 3, 3)),
        )

"""Break down the rgb obs cost on PickCube @2048 (the 0.82x baseline gap).

Times: state-only env.step, env.step with rgb obs, and the rasterizer stages
(vertex transform, binning/compaction, pallas kernel) separately.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make

N = int(os.environ.get("N", "2048"))
ENV_ID = os.environ.get("ENV_ID", "PickCube-v1")
W = H = int(os.environ.get("RES", "128"))


def timeit(name, fn, *args, reps=30):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:34s} {dt*1e3:8.3f} ms")
    return out


def step_rate(env, label):
    base = env.unwrapped
    act = jnp.zeros((N,) + base.single_action_space.shape, jnp.float32)
    obs, *_ = env.step(act)
    jax.block_until_ready(obs)
    t0 = time.perf_counter()
    for _ in range(60):
        obs, *_ = env.step(act)
    jax.block_until_ready(obs)
    dt = (time.perf_counter() - t0) / 60
    print(f"{label:34s} {dt*1e3:8.3f} ms   -> {N/dt:,.0f} steps/s")
    return dt


env_s = make(ENV_ID, num_envs=N, obs_mode="state", control_mode="pd_joint_delta_pos")
env_s.reset(seed=0)
dt_state = step_rate(env_s, "env.step state")
env_s.close()

env = make(
    ENV_ID, num_envs=N, obs_mode="rgb", control_mode="pd_joint_delta_pos",
    sensor_configs=dict(width=W, height=H),
)
base = env.unwrapped
env.reset(seed=0)
dt_rgb = step_rate(env, "env.step rgb")
print(f"render overhead: {(dt_rgb-dt_state)*1e3:.3f} ms/frame-batch "
      f"({(dt_rgb/dt_state-1)*100:.0f}%)")

# rasterizer stage breakdown on the live scene
cam = base._sensors["base_camera"]
mesh = cam._get_mesh(tuple(base._hidden_objects))
print("faces:", mesh.num_faces, "verts:", mesh.verts.shape[0])

from maniskill_tpu.physics.kinematics import geom_poses  # noqa: E402
from maniskill_tpu.render.pallas_rasterizer import pallas_rasterize_tiles  # noqa: E402

data = base.scene.data
model = base.scene.model


def world_verts(d):
    gp, gq = geom_poses(model, d)
    return mesh.world_vertices(gp, gq)


wv = timeit("vertex world transform", world_verts, data)

view = cam._view_matrix()
proj = cam.proj
fv = np.asarray(mesh.faces)


def vertex_stage(wv):
    B, V, _ = wv.shape
    vh = jnp.concatenate([wv, jnp.ones((B, V, 1), wv.dtype)], -1)
    camv = jnp.einsum("bij,bvj->bvi", view, vh)
    clip = (
        jnp.einsum("ij,bvj->bvi", proj, camv)
        if proj.ndim == 2
        else jnp.einsum("bij,bvj->bvi", proj, camv)
    )
    w = clip[..., 3:4]
    w_safe = jnp.where(jnp.abs(w) < 1e-6, 1e-6, w)
    ndc = clip[..., :3] / w_safe
    sx = (ndc[..., 0] * 0.5 + 0.5) * W
    sy = (0.5 - ndc[..., 1] * 0.5) * H
    zcam = -camv[..., 2]
    fx, fy, fz = sx[:, fv], sy[:, fv], zcam[:, fv]
    ffront = (zcam > 1e-4)[:, fv]
    area2 = (fx[..., 1] - fx[..., 0]) * (fy[..., 2] - fy[..., 0]) - (
        fx[..., 2] - fx[..., 0]
    ) * (fy[..., 1] - fy[..., 0])
    ok = (ffront.all(-1) & (area2 < 0.0)).astype(jnp.int32)
    return fx, fy, 1.0 / jnp.maximum(fz, 1e-6), ok


fx, fy, inv_z, ok = timeit("vertex+face stage", vertex_stage, wv)

from maniskill_tpu.render.rasterizer import _face_rgb  # noqa: E402

face_rgb = timeit("face shading", lambda wv: _face_rgb(mesh, wv, None), wv)

timeit(
    "pallas raster (incl. binning)",
    lambda *a: pallas_rasterize_tiles(*a, H, W),
    fx, fy, inv_z, ok, face_rgb, jnp.asarray(mesh.face_seg, jnp.int32),
)


def binning_only(fx, fy, ok):
    T = H // 16
    ymin = jnp.min(fy, axis=-1)
    ymax = jnp.max(fy, axis=-1)
    xmin = jnp.min(fx, axis=-1)
    xmax = jnp.max(fx, axis=-1)
    on = (ok > 0) & (xmax >= 0) & (xmin < W) & (ymax >= 0) & (ymin < H)
    bands = jnp.arange(T, dtype=jnp.float32)[None, :, None] * 16
    overlap = (
        on[:, None, :] & (ymax[:, None, :] >= bands) & (ymin[:, None, :] < bands + 16)
    )
    order = jnp.argsort(~overlap, axis=-1, stable=True)
    counts = jnp.sum(overlap, axis=-1)
    return order[..., :256], counts


timeit("binning argsort only", binning_only, fx, fy, ok)


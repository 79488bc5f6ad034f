"""Rendering / visual-obs tests (reference obs-mode matrix analog, SURVEY §4)."""
import numpy as np
import jax.numpy as jnp
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make

SMALL = dict(width=48, height=48)


def test_rgb_obs():
    env = make("PushCube-v1", num_envs=2, obs_mode="rgb", sensor_configs=dict(**SMALL))
    obs, _ = env.reset(seed=0)
    rgb = obs["sensor_data"]["base_camera"]["rgb"]
    assert rgb.shape == (2, 48, 48, 3)
    assert rgb.dtype == jnp.uint8
    # scene is lit: image must not be all-black / all-white
    arr = np.asarray(rgb)
    assert arr.max() > 30 and arr.min() < 240
    obs, *_ = env.step(env.unwrapped.action_space.sample() * 0)
    assert obs["sensor_data"]["base_camera"]["rgb"].shape == (2, 48, 48, 3)
    env.close()


def test_rgbd_segmentation_obs():
    env = make(
        "PushCube-v1", num_envs=2, obs_mode="rgb+depth+segmentation",
        sensor_configs=dict(**SMALL),
    )
    obs, _ = env.reset(seed=0)
    data = obs["sensor_data"]["base_camera"]
    assert data["depth"].shape == (2, 48, 48, 1)
    assert data["depth"].dtype == jnp.int16
    assert data["segmentation"].shape == (2, 48, 48, 1)
    # depth: mm units; camera ~0.7m from scene -> values in the hundreds
    d = np.asarray(data["depth"])
    assert d.max() > 300, d.max()
    # segmentation: more than one id visible (table/ground + cube or robot)
    seg = np.asarray(data["segmentation"])
    assert len(np.unique(seg)) >= 2
    env.close()


def test_pointcloud_obs():
    env = make(
        "PushCube-v1", num_envs=2, obs_mode="pointcloud",
        sensor_configs=dict(**SMALL),
    )
    obs, _ = env.reset(seed=0)
    pcd = obs["pointcloud"]
    assert pcd["xyzw"].shape == (2, 48 * 48, 4)
    xyz = np.asarray(pcd["xyzw"])
    valid = xyz[..., 3] > 0
    assert valid.any()
    # valid world points should be near the tabletop (z in [-1, 1])
    zs = xyz[..., 2][valid]
    assert np.all(zs > -1.5) and np.all(zs < 1.5)
    env.close()


def test_sensor_params():
    env = make("PushCube-v1", num_envs=2, obs_mode="rgb", sensor_configs=dict(**SMALL))
    obs, _ = env.reset(seed=0)
    params = obs["sensor_param"]["base_camera"]
    assert params["extrinsic_cv"].shape == (2, 3, 4)
    assert params["cam2world_gl"].shape == (2, 4, 4)
    assert params["intrinsic_cv"].shape == (2, 3, 3)
    env.close()


def test_pallas_rasterizer_matches_jnp():
    """128x128 uses the Pallas tiled kernel on TPU; must agree with the jnp
    path (same scene, same camera)."""
    import jax

    from maniskill_tpu.render import pallas_rasterizer as pr

    env = make("PushCube-v1", num_envs=2, obs_mode="rgb+depth+segmentation")
    obs, _ = env.reset(seed=0)
    d_fast = obs["sensor_data"]["base_camera"]

    if not pr.pallas_available(128, 128):
        pytest.skip("pallas path unavailable on this backend")

    # force the jnp path by monkeypatching availability
    orig = pr.pallas_available
    pr.pallas_available = lambda *a, **k: False
    try:
        base = env.unwrapped
        cam = base._sensors["base_camera"]
        out = cam.get_obs(
            rgb=True, depth=True, segmentation=True,
            hidden_actors=base._hidden_objects,
        )
    finally:
        pr.pallas_available = orig

    d_ref = out
    # depth agreement within 2mm on >=99% of pixels (edge pixels may differ)
    a = np.asarray(d_fast["depth"], np.int32)
    b = np.asarray(d_ref["depth"], np.int32)
    close = np.abs(a - b) <= 2
    assert close.mean() > 0.99, close.mean()
    seg_same = (
        np.asarray(d_fast["segmentation"]) == np.asarray(d_ref["segmentation"])
    )
    assert seg_same.mean() > 0.99, seg_same.mean()
    env.close()


def test_human_render_camera():
    env = make(
        "PushCube-v1", num_envs=2, obs_mode="state", render_mode="rgb_array",
        human_render_camera_configs=dict(width=64, height=64),
    )
    env.reset(seed=0)
    img = env.render()
    assert img.shape == (2, 64, 64, 3)
    env.close()


def test_normal_albedo_modalities():
    """normal/albedo extra textures ("default" shader pack analog)."""
    import jax.numpy as jnp

    env = make("PushCube-v1", num_envs=2, obs_mode="rgb+normal+albedo")
    obs, _ = env.reset(seed=0)
    cam = obs["sensor_data"]["base_camera"]
    assert cam["normal"].shape == (2, 128, 128, 3)
    assert cam["normal"].dtype == jnp.float32
    # foreground normals are unit length
    n = np.linalg.norm(np.asarray(cam["normal"]), axis=-1)
    fg = n > 0.1
    assert fg.any()
    np.testing.assert_allclose(n[fg], 1.0, atol=5e-3)
    assert cam["albedo"].shape == (2, 128, 128, 3)
    assert cam["albedo"].dtype == jnp.uint8
    env.close()


def test_heterogeneous_hull_rendering():
    """Per-env hull objects produce per-env images (PickSingleYCB path)."""
    env = make("PickSingleYCB-v1", num_envs=2, obs_mode="rgb")
    obs, _ = env.reset(seed=0)
    rgb = np.asarray(obs["sensor_data"]["base_camera"]["rgb"])
    assert rgb.shape == (2, 128, 128, 3)
    base = env.unwrapped
    if base.model_ids[0] != base.model_ids[1]:
        assert (rgb[0] != rgb[1]).any()
    env.close()


def test_rt_shader_pack():
    """rt-fast ray-traced shader pack (reference render/shaders.py:103-135):
    rgb/depth/segmentation contract holds and the image differs from the
    rasterized one (shadows / sampled lighting)."""
    env = make("PushCube-v1", num_envs=2, obs_mode="rgb+depth+segmentation",
               sensor_configs=dict(shader_pack="rt-fast", width=64, height=64))
    obs, _ = env.reset(seed=0)
    cam = obs["sensor_data"]["base_camera"]
    rgb = np.asarray(cam["rgb"])
    assert rgb.shape == (2, 64, 64, 3) and rgb.dtype == np.uint8
    assert rgb.std() > 1.0
    assert np.asarray(cam["depth"]).dtype == np.int16
    assert (np.asarray(cam["depth"]) > 0).mean() > 0.5
    assert len(np.unique(np.asarray(cam["segmentation"]))) > 2
    env.close()

    env2 = make("PushCube-v1", num_envs=2, obs_mode="rgb",
                sensor_configs=dict(width=64, height=64))
    obs2, _ = env2.reset(seed=0)
    raster = np.asarray(obs2["sensor_data"]["base_camera"]["rgb"])
    # the two shading models must actually differ (rt adds shadows)
    assert np.abs(raster.astype(int) - rgb.astype(int)).mean() > 2.0
    env2.close()


def test_textured_table_top():
    """Baked-texture rendering (VERDICT r3 #6): the wood-grain table top must
    produce spatial color variation, not a flat fill, and the texture
    machinery (grid bake + per-face colors) must round-trip."""
    from maniskill_tpu.render.textures import (
        bake_face_colors,
        checker,
        textured_quad_grid,
        wood,
    )

    img = checker(32, tiles=4, c1=(1, 1, 1), c2=(0, 0, 0))
    v, f, fc = textured_quad_grid(0.5, 0.5, img, res=8)
    assert f.shape == (128, 3) and fc.shape == (128, 3)
    # checker bake must contain both near-white and near-black faces
    assert fc.max() > 0.9 and fc.min() < 0.1

    env = make(
        "PushCube-v1", num_envs=1, obs_mode="rgb",
        sensor_configs=dict(width=128, height=128),
    )
    obs, _ = env.reset(seed=0)
    rgb = np.asarray(obs["sensor_data"]["base_camera"]["rgb"][0], np.float32)
    # the lower half of the frame is dominated by the table: wood grain means
    # many distinct colors there (flat fill would give a handful)
    table_region = rgb[64:, :, :]
    colors = np.unique(table_region.reshape(-1, 3), axis=0)
    assert len(colors) > 50, f"table looks flat: {len(colors)} distinct colors"
    env.close()

"""Digital-twin suite tests (reference digital_twins/: bridge_dataset_eval
put_on_in_scene.py + so100_arm/grasp_cube.py analogs): greenscreen
compositing, per-step camera randomization, and the bbox-overlap success
logic."""
import numpy as np
import jax.numpy as jnp
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make

BRIDGE_IDS = [
    "PutCarrotOnPlateInScene-v1",
    "PutEggplantInBasketScene-v1",
    "StackGreenCubeOnYellowCubeBakedTexInScene-v1",
    "PutSpoonOnTableClothInScene-v1",
]


def test_bridge_greenscreen_composite():
    """Background pixels must come from the overlay image; foreground
    (kept) objects must remain simulated (base_env.py greenscreen)."""
    env = make("PutCarrotOnPlateInScene-v1", num_envs=2,
               obs_mode="rgb+segmentation")
    base = env.unwrapped
    obs, _ = env.reset(seed=0)
    cam = obs["sensor_data"]["3rd_view_camera"]
    rgb = np.asarray(cam["rgb"])
    seg = np.asarray(cam["segmentation"])[..., 0]
    overlay = np.asarray(base._rgb_overlay_images["3rd_view_camera"])
    keep = np.asarray(base._keep_lut)[np.clip(seg, 0, len(np.asarray(base._keep_lut)) - 1)]
    # all non-kept pixels exactly equal the overlay
    bg = ~keep
    assert bg.any(), "expected some background pixels"
    assert (rgb[bg] == np.broadcast_to(overlay[None], rgb.shape)[bg]).all()
    # kept pixels exist (robot + carrot + plate visible) and differ somewhere
    assert keep.any(), "expected kept foreground pixels"
    env.close()


def test_bridge_success_logic_runs():
    env = make("StackGreenCubeOnYellowCubeBakedTexInScene-v1", num_envs=2,
               obs_mode="state")
    obs, _ = env.reset(seed=1)
    for _ in range(3):
        obs, rew, term, trunc, info = env.step(env.action_space.sample())
    for k in ("success", "is_src_obj_grasped", "consecutive_grasp"):
        assert k in info
        assert np.asarray(info[k]).shape == (2,)
    env.close()


def test_so100_per_step_camera_randomization():
    """The camera mount pose must change every control step when domain
    randomization is on (grasp_cube.py _before_control_step analog)."""
    env = make("SO100GraspCube-v1", num_envs=2, obs_mode="state")
    base = env.unwrapped
    env.reset(seed=0)
    p0 = np.asarray(base.camera_mount.pose.raw_pose)
    env.step(env.action_space.sample())
    p1 = np.asarray(base.camera_mount.pose.raw_pose)
    env.step(env.action_space.sample())
    p2 = np.asarray(base.camera_mount.pose.raw_pose)
    assert not np.allclose(p0, p1)
    assert not np.allclose(p1, p2)
    # and the two envs get different poses (per-env RNG)
    assert not np.allclose(p1[0], p1[1])
    env.close()


def test_so100_no_randomization_is_static():
    env = make("SO100GraspCube-v1", num_envs=2, obs_mode="state",
               domain_randomization=False)
    base = env.unwrapped
    env.reset(seed=0)
    p0 = np.asarray(base.camera_mount.pose.raw_pose)
    env.step(env.action_space.sample())
    p1 = np.asarray(base.camera_mount.pose.raw_pose)
    assert np.allclose(p0, p1)
    env.close()


def test_so100_heterogeneous_cube_sizes():
    env = make("SO100GraspCube-v1", num_envs=4, obs_mode="state")
    base = env.unwrapped
    env.reset(seed=3)
    halfs = np.asarray(base.cube_half_sizes)
    assert halfs.shape == (4,)
    assert np.unique(halfs).size > 1, "cube sizes should differ per env"
    lo, hi = base.domain_randomization_config.cube_half_size_range
    assert (halfs >= lo).all() and (halfs <= hi).all()
    env.close()


@pytest.mark.parametrize("env_id", BRIDGE_IDS)
def test_bridge_envs_state_smoke(env_id):
    env = make(env_id, num_envs=2, obs_mode="state")
    obs, _ = env.reset(seed=0)
    for _ in range(2):
        obs, rew, term, trunc, info = env.step(env.action_space.sample())
    assert np.isfinite(np.asarray(obs)).all()
    env.close()

"""Whole-registry smoke test + obs/control-mode matrix
(reference test_gpu_envs.py:29-99 and tests/utils.py:21-46 analogs).

Every registered env is constructed and stepped 5x with random actions and
must produce finite rewards and a sim-state dict. The obs-mode x
control-mode matrix runs on a representative stationary env. First runs pay
a per-env compile; the persistent compilation cache (conftest) makes
repeats cheap.

Tiers (the full 79-env sweep costs ~1 h of compiles, so it is opt-in,
nightly-style; the default keeps one env per task family continuously
verified):
- default:                one representative env per family (REP_IDS)
- MS_TEST_SMOKE_FULL=1:   every registered env
- MS_TEST_SMOKE_CORE=1:   2-env minimal set (quick local iteration)
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import REGISTERED_ENVS, make

CORE_ONLY = bool(os.environ.get("MS_TEST_SMOKE_CORE"))
FULL = bool(os.environ.get("MS_TEST_SMOKE_FULL"))
# ink bodies make the drawing envs compile slowly at full budget; the smoke
# pass exercises the mechanism with a small budget
SMALL_KWARGS = {
    "TableTopFreeDraw-v1": dict(max_dots=8),
    "DrawTriangle-v1": dict(max_dots=8),
    "DrawSVG-v1": dict(max_dots=8),
}

# EVERY registered env constructs and steps under MS_TEST_SMOKE_FULL=1 —
# benchmarks and all SceneManipulation layout variants included (round-2
# verdict: the excluded set contained exactly the env that broke bench.py)
ALL_IDS = sorted(REGISTERED_ENVS)
CORE_IDS = ["StackCube-v1", "MS-HopperStand-v1"]
# default tier: one env per task family (tabletop, drawing, mobile
# manipulation, dexterity, humanoid control, quadruped, benchmark)
REP_IDS = [
    "StackCube-v1",
    "DrawTriangle-v1",
    "OpenCabinetDrawer-v1",
    "RotateValveLevel2-v1",
    "MS-HopperStand-v1",
    "AnymalC-Reach-v1",
    "FrankaPickCubeBenchmark-v1",
]
REP_IDS = [e for e in REP_IDS if e in REGISTERED_ENVS]
SMOKE_IDS = ALL_IDS if FULL else (CORE_IDS if CORE_ONLY else REP_IDS)


@pytest.mark.parametrize("env_id", SMOKE_IDS)
def test_registry_env_steps(env_id):
    env = make(env_id, num_envs=2, **SMALL_KWARGS.get(env_id, {}))
    base = env.unwrapped
    obs, info = env.reset(seed=0)
    for _ in range(5):
        obs, rew, term, trunc, info = env.step(base.action_space.sample())
    assert rew.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(rew))), f"{env_id} produced non-finite rewards"
    state = base.get_state_dict()
    assert state  # sim-state dict exists for checkpointing
    env.close()


OBS_MODES = ["state", "state_dict", "rgb", "rgb+depth+segmentation", "pointcloud"]
CONTROL_MODES = [
    "pd_joint_delta_pos",
    "pd_joint_pos",
    "pd_ee_delta_pose",
    "pd_ee_delta_pos",
]


@pytest.mark.parametrize("obs_mode", OBS_MODES)
def test_obs_mode_matrix(obs_mode):
    env = make("PushCube-v1", num_envs=2, obs_mode=obs_mode)
    obs, _ = env.reset(seed=0)
    obs2, rew, term, trunc, info = env.step(env.unwrapped.action_space.sample())
    if obs_mode == "state":
        assert obs2.ndim == 2 and obs2.shape[0] == 2
    elif obs_mode == "state_dict":
        assert "agent" in obs2 and "extra" in obs2
    elif obs_mode == "pointcloud":
        pcd = obs2["pointcloud"]
        assert "xyzw" in pcd and pcd["xyzw"].shape[0] == 2
        assert pcd["xyzw"].shape[-1] == 4
        assert "rgb" in pcd
    else:
        cam = obs2["sensor_data"]["base_camera"]
        if "rgb" in obs_mode:
            assert cam["rgb"].shape == (2, 128, 128, 3)
            assert cam["rgb"].dtype == jnp.uint8
        if "depth" in obs_mode:
            # int16 millimeter depth (minimal-shader contract)
            assert cam["depth"].dtype == jnp.int16
        if "segmentation" in obs_mode:
            assert cam["segmentation"].dtype == jnp.int16
    env.close()


@pytest.mark.parametrize("control_mode", CONTROL_MODES)
def test_control_mode_matrix(control_mode):
    env = make(
        "PickCube-v1", num_envs=2, obs_mode="state", control_mode=control_mode
    )
    base = env.unwrapped
    obs, _ = env.reset(seed=0)
    for _ in range(3):
        obs, rew, term, trunc, info = env.step(base.action_space.sample())
    assert bool(jnp.all(jnp.isfinite(obs)))
    env.close()

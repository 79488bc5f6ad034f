"""RoboCasa kitchen platform + concrete task variants.

Mirrors the reference's kitchen task family structure
(mani_skill/envs/tasks/mobile_manipulation/robocasa/kitchen.py): a platform
env plus objective subclasses. Success logic is validated by teleporting
state into/out of the goal condition, the same oracle style as test_envs.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make


@pytest.fixture(scope="module")
def drawer_env():
    env = make("RoboCasaOpenDrawer-v1", num_envs=2, obs_mode="state")
    yield env
    env.close()


def test_open_drawer_success_flips(drawer_env):
    env = drawer_env
    base = env.unwrapped
    obs, _ = env.reset(seed=0)
    act = jnp.zeros((2,) + base.single_action_space.shape, jnp.float32)
    obs, rew, term, trunc, info = env.step(act)
    assert not bool(np.asarray(info["success"]).any())

    # teleport the target drawer open past the threshold
    art = base.drawer_stack
    qpos = np.asarray(art.qpos)
    j = base.target_joint
    col = [k for k, aj in enumerate(art.active_joints) if aj is j][0]
    qpos[:, col] = base.OPEN_MIN + 0.05
    art.set_qpos(jnp.asarray(qpos))
    info = base.evaluate()
    assert bool(np.asarray(info["success"]).all())
    assert np.asarray(info["open_amount"]).min() > base.OPEN_MIN


def test_open_drawer_dense_reward_monotone(drawer_env):
    base = drawer_env.unwrapped
    drawer_env.reset(seed=1)
    act = jnp.zeros((2,) + base.single_action_space.shape, jnp.float32)

    info_closed = base.evaluate()
    r_closed = base.compute_dense_reward(None, act, info_closed)

    art = base.drawer_stack
    qpos = np.asarray(art.qpos)
    j = base.target_joint
    col = [k for k, aj in enumerate(art.active_joints) if aj is j][0]
    qpos[:, col] = base.OPEN_MIN + 0.05
    art.set_qpos(jnp.asarray(qpos))
    info_open = base.evaluate()
    r_open = base.compute_dense_reward(None, act, info_open)
    assert (np.asarray(r_open) > np.asarray(r_closed)).all()


def test_pnp_counter_to_sink_success_flips():
    env = make("RoboCasaPnPCounterToSink-v1", num_envs=2, obs_mode="state")
    try:
        base = env.unwrapped
        env.reset(seed=0)
        act = jnp.zeros((2,) + base.single_action_space.shape, jnp.float32)
        env.step(act)
        info = base.evaluate()
        assert not bool(np.asarray(info["success"]).any())

        # teleport the target object into the sink basin, at rest
        from maniskill_tpu.structs.pose import Pose
        import maniskill_tpu.scene_builder.robocasa.fixtures as F

        center = np.asarray(base._sink_center)
        pos = np.tile(
            np.array([center[0], center[1], F.COUNTER_H - 0.08], np.float32),
            (2, 1),
        )
        base.target_object.set_pose(Pose.create_from_pq(p=jnp.asarray(pos)))
        base.target_object.set_linear_velocity(jnp.zeros((2, 3)))
        base.target_object.set_angular_velocity(jnp.zeros((2, 3)))
        info = base.evaluate()
        assert bool(np.asarray(info["in_basin"]).all())
        assert bool(np.asarray(info["success"]).all())
    finally:
        env.close()


def test_kitchen_platform_layouts_build():
    # the platform env builds under a non-default layout too
    env = make(
        "RoboCasaKitchen-v1", num_envs=1, obs_mode="state",
        layout_ids=2, fixtures_only=True,
    )
    try:
        env.reset(seed=0)
        base = env.unwrapped
        assert base.articulated, "kitchen should have articulated fixtures"
    finally:
        env.close()

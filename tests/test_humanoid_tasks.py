"""G1 humanoid whole-body manipulation tasks (counterpart coverage for
reference envs/tasks/humanoid/humanoid_pick_place.py and transport_box.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make


@pytest.mark.parametrize(
    "env_id,reward_mode",
    [
        ("UnitreeG1PlaceAppleInBowl-v1", "normalized_dense"),
        ("UnitreeG1TransportBox-v1", "dense"),
    ],
)
def test_g1_task_steps(env_id, reward_mode):
    env = make(env_id, num_envs=2, obs_mode="state", reward_mode=reward_mode)
    obs, info = env.reset(seed=3)
    assert np.isfinite(np.asarray(obs)).all()
    for _ in range(5):
        obs, rew, term, trunc, info = env.step(
            env.unwrapped.action_space.sample()
        )
    assert np.isfinite(np.asarray(obs)).all()
    assert np.isfinite(np.asarray(rew)).all()
    ev = env.unwrapped.evaluate()
    assert "success" in ev and ev["success"].shape == (2,)
    env.close()


def test_g1_grasp_helpers_shapes():
    env = make("UnitreeG1PlaceAppleInBowl-v1", num_envs=2, obs_mode="state")
    env.reset(seed=0)
    agent = env.unwrapped.agent
    # finger joint indexes resolve all 7 rubber-hand joints per side
    assert len(agent.right_finger_joint_indexes) == 7
    assert len(agent.left_finger_joint_indexes) == 7
    d = agent.right_hand_dist_to_open_grasp()
    assert d.shape == (2,) and bool(jnp.all(jnp.isfinite(d)))
    g = agent.right_hand_is_grasping(env.unwrapped.apple, max_angle=110)
    assert g.shape == (2,) and g.dtype == bool
    env.close()

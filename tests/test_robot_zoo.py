"""Robot-zoo tests: every registered agent builds in an Empty scene, steps
without NaNs, and honors its keyframe (reference test strategy: per-robot
smoke in test_agents.py). Heavy: one compile per robot — kept green by the
persistent compilation cache."""
import os

import numpy as np
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.agents.registration import REGISTERED_AGENTS
from maniskill_tpu.utils.registration import make

CORE_ONLY = bool(os.environ.get("MS_TEST_SMOKE_CORE"))
# agents with no sim build (real-robot adapters) are exercised elsewhere
SKIP = set()

ALL_UIDS = sorted(REGISTERED_AGENTS)
CORE_UIDS = ["panda", "floating_inspire_hand_right", "unitree_g1"]


def test_registry_size():
    # reference: 44 registered agents (mani_skill/agents/robots/); ours must
    # stay within striking distance and never regress
    assert len(REGISTERED_AGENTS) >= 44


@pytest.mark.parametrize("uid", CORE_UIDS if CORE_ONLY else ALL_UIDS)
def test_agent_builds_and_steps(uid):
    if uid in SKIP:
        pytest.skip("no sim build")
    env = make("Empty-v1", num_envs=2, robot_uids=uid)
    base = env.unwrapped
    obs, _ = env.reset(seed=0)
    for _ in range(3):
        obs, rew, term, trunc, info = env.step(base.action_space.sample())
    q = np.asarray(base.agent.robot.qpos)
    assert np.isfinite(q).all(), f"{uid} produced NaN qpos"
    # keyframes (when declared) must match the robot's dof
    for name, kf in base.agent.keyframes.items():
        qpos = np.asarray(kf.qpos).reshape(-1)
        assert qpos.shape[0] == int(base.agent.robot.dof), (
            f"{uid} keyframe {name}: {qpos.shape[0]} != dof "
            f"{int(base.agent.robot.dof)}"
        )
    env.close()

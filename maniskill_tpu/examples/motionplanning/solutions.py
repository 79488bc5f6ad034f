"""Scripted motion-planning solutions (counterpart of
mani_skill/examples/motionplanning/panda/solutions/*.py) — batched: every
env is solved simultaneously with per-env goal poses.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .panda_solver import PandaMotionPlanningSolver

# EE orientation pointing straight down (panda hand z-axis toward table)
_DOWN_Q = np.array([0.0, 1.0, 0.0, 0.0], np.float32)


def _pose(p, q=_DOWN_Q):
    return jnp.concatenate([p, jnp.broadcast_to(jnp.asarray(q), p.shape[:-1] + (4,))], axis=-1)


def solve_push_cube(env, debug: bool = False):
    """Scripted PushCube: park behind the cube then push through the goal
    (reference solutions/push_cube.py flow)."""
    base = env.unwrapped
    mp = PandaMotionPlanningSolver(env)
    mp.close_gripper(steps=3)

    cube_p = base.obj.pose.p
    goal_p = base.goal_region.pose.p
    push_dir = goal_p[:, :2] - cube_p[:, :2]
    push_dir = push_dir / (jnp.linalg.norm(push_dir, axis=-1, keepdims=True) + 1e-8)

    lift = 0.02
    behind = cube_p.at[:, :2].add(-push_dir * 0.08).at[:, 2].add(lift)
    mp.move_to_pose(_pose(behind), refine_steps=4)
    through = cube_p.at[:, :2].add(push_dir * (jnp.linalg.norm(
        goal_p[:, :2] - cube_p[:, :2], axis=-1, keepdims=True))).at[:, 2].add(lift)
    result = mp.move_to_pose(_pose(through), refine_steps=6)
    return result


def solve_pick_cube(env, debug: bool = False):
    """Scripted PickCube: hover, descend, grasp, lift to goal
    (reference solutions/pick_cube.py flow)."""
    base = env.unwrapped
    mp = PandaMotionPlanningSolver(env)
    mp.open_gripper(steps=3)

    cube_p = base.cube.pose.p
    hover = cube_p.at[:, 2].add(0.08)
    mp.move_to_pose(_pose(hover), refine_steps=3)
    grasp = cube_p.at[:, 2].add(0.015)
    mp.move_to_pose(_pose(grasp), refine_steps=5)
    mp.close_gripper(steps=8)
    goal_p = base.goal_site.pose.p
    result = mp.move_to_pose(_pose(goal_p), refine_steps=10)
    return result


SOLUTIONS = {
    "PushCube-v1": solve_push_cube,
    "PickCube-v1": solve_pick_cube,
}

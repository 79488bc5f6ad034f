"""Robot showcase CLI (counterpart of mani_skill/examples/demo_robot.py).

Loads a registered robot into Empty-v1, prints its structure (links,
joints, controllers, keyframes), optionally cycles through keyframes and
dumps rendered frames.

Usage:
    python -m maniskill_tpu.examples.demo_robot -r panda [--keyframes]
    python -m maniskill_tpu.examples.demo_robot --list
"""
from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-r", "--robot-uid", default="panda")
    p.add_argument("--list", action="store_true", help="list registered robots")
    p.add_argument("--keyframes", action="store_true", help="cycle keyframes")
    p.add_argument("--steps", type=int, default=20, help="settle steps per keyframe")
    p.add_argument("--save-frames", default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.agents.registration import REGISTERED_AGENTS
    from maniskill_tpu.utils.registration import make

    if args.list:
        for uid in sorted(REGISTERED_AGENTS):
            print(uid)
        return

    render = bool(args.save_frames)
    env = make(
        "Empty-v1", num_envs=1, obs_mode="state", robot_uids=args.robot_uid,
        render_mode="rgb_array" if render else None,
    )
    base = env.unwrapped
    env.reset(seed=0)
    agent = base.agent
    robot = agent.robot

    print(f"robot: {args.robot_uid}")
    print(f"  dof: {robot.dof}")
    print(f"  links ({len(robot.links)}): {[l.name for l in robot.links]}")
    print(f"  active joints: {[j.name for j in robot.active_joints]}")
    print(f"  control modes: {list(agent._controller_configs.keys())}")
    print(f"  action space: {base.single_action_space}")
    print(f"  keyframes: {list(getattr(agent, 'keyframes', {}).keys())}")

    if args.keyframes:
        import os

        if args.save_frames:
            os.makedirs(args.save_frames, exist_ok=True)
        act = jnp.zeros((1,) + base.single_action_space.shape, jnp.float32)
        for name, kf in getattr(agent, "keyframes", {}).items():
            if kf.qpos is not None:
                agent.reset(jnp.asarray(kf.qpos, jnp.float32))
            for _ in range(args.steps):
                env.step(act)
            q = np.asarray(robot.qpos[0])
            print(f"keyframe {name}: qpos after settle {np.round(q, 3)}")
            if args.save_frames:
                frame = np.asarray(env.render()[0])
                np.save(f"{args.save_frames}/{name}.npy", frame)
    env.close()


if __name__ == "__main__":
    main()

"""Random-action demo CLI (counterpart of
mani_skill/examples/demo_random_action.py).

Usage:
    python -m maniskill_tpu.examples.demo_random_action -e PushCube-v1 -n 4 \
        [--render-mode rgb_array --record-dir out/]
"""
from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--env-id", default="PushCube-v1")
    p.add_argument("-n", "--num-envs", type=int, default=4)
    p.add_argument("-o", "--obs-mode", default="state")
    p.add_argument("-c", "--control-mode", default=None)
    p.add_argument("--render-mode", default=None)
    p.add_argument("--record-dir", default=None)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make

    env = make(
        args.env_id, num_envs=args.num_envs, obs_mode=args.obs_mode,
        control_mode=args.control_mode, render_mode=args.render_mode,
    )
    if args.record_dir:
        from maniskill_tpu.wrappers.record import RecordEpisode

        env = RecordEpisode(env, args.record_dir, save_video=args.render_mode is not None)
    base = env.unwrapped
    base.print_sim_details()
    obs, info = env.reset(seed=args.seed)
    for i in range(args.steps):
        action = base.action_space.sample()
        obs, reward, terminated, truncated, info = env.step(action)
        if i % 10 == 0:
            print(
                f"step {i}: reward mean {float(np.asarray(reward).mean()):.3f} "
                f"success {np.asarray(info.get('success', False)).sum()}"
            )
    env.close()


if __name__ == "__main__":
    main()

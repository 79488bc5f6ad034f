"""Reset-distribution demo CLI (counterpart of
mani_skill/examples/demo_reset_distribution.py): resets an env repeatedly
with different seeds and saves one rendered frame per reset so the initial
state randomization can be inspected.

Usage:
    python -m maniskill_tpu.examples.demo_reset_distribution -e PushCube-v1 \
        -n 20 --record-dir out/resets
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--env-id", default="PushCube-v1")
    p.add_argument("-n", "--num-resets", type=int, default=20)
    p.add_argument("--shader", default="minimal")
    p.add_argument("--record-dir", default="videos/reset_distributions")
    p.add_argument("-s", "--seed", type=int, default=0)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.utils.visualization import images_to_video

    env = make(
        args.env_id, num_envs=1, obs_mode="state", reward_mode="none",
        render_mode="rgb_array",
        human_render_camera_configs=dict(shader_pack=args.shader),
    )
    frames = []
    for i in range(args.num_resets):
        env.reset(seed=args.seed + i)
        frame = np.asarray(env.render())
        frames.append(frame[0] if frame.ndim == 4 else frame)
    env.close()
    os.makedirs(args.record_dir, exist_ok=True)
    images_to_video(
        frames, args.record_dir,
        video_name=f"{args.env_id}_reset_distribution", fps=2,
    )
    print(f"saved {len(frames)} reset frames to {args.record_dir}")


if __name__ == "__main__":
    main()

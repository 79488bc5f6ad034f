"""Motion-planning demo/trajectory-generation CLI (counterpart of
mani_skill/examples/motionplanning/panda/run.py).

Usage:
    python -m maniskill_tpu.examples.motionplanning.run --env-id PickCube-v1 \
        --num-envs 16 [--save-traj --output-dir out/]
"""
from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PickCube-v1")
    p.add_argument("--num-envs", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-traj", action="store_true")
    p.add_argument("--output-dir", default="out")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.examples.motionplanning.solutions import SOLUTIONS

    if args.env_id not in SOLUTIONS:
        raise SystemExit(
            f"no scripted solution for {args.env_id}; have {sorted(SOLUTIONS)}"
        )

    env = make(
        args.env_id, num_envs=args.num_envs, obs_mode="state",
        control_mode="pd_joint_pos",
    )
    if args.save_traj:
        from maniskill_tpu.wrappers.record import RecordEpisode

        env = RecordEpisode(env, args.output_dir, save_trajectory=True,
                            save_video=False,
                            trajectory_name=f"mp_{args.env_id}")
    env.reset(seed=args.seed)
    result = SOLUTIONS[args.env_id](env)
    info = result[-1]
    success = np.asarray(info.get("success", False))
    print(f"{args.env_id}: success {success.mean():.2f} ({success.sum()}/{len(success)})")
    env.close()


if __name__ == "__main__":
    main()

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
    p.add_argument("--episodes", type=int, default=None,
                   help="keep re-running with fresh seeds until this many "
                        "SUCCESSFUL episodes are recorded (demo generation "
                        "mode, like the reference run.py -n)")
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

    total_succ, total_ep, batch = 0, 0, 0
    target = args.episodes
    while True:
        env.reset(seed=args.seed + batch)
        result = SOLUTIONS[args.env_id](env)
        info = result[-1]
        success = np.asarray(info.get("success", False))
        total_succ += int(success.sum())
        total_ep += len(success)
        print(
            f"{args.env_id} batch {batch}: success {success.mean():.2f} "
            f"({total_succ}/{total_ep} cumulative)",
            flush=True,
        )
        batch += 1
        if target is None or total_succ >= target:
            break
    env.close()
    if args.save_traj:
        print(
            f"trajectories in {args.output_dir} (JSON metadata marks per-"
            "episode success; load with success_only=True to filter)"
        )


if __name__ == "__main__":
    main()

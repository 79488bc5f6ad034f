"""Pointcloud visualization CLI (counterpart of
mani_skill/examples/demo_vis_pcd.py).

Steps an env in pointcloud obs mode and dumps the merged world-frame cloud
to .ply (ASCII) or .npy for external viewers.

Usage:
    python -m maniskill_tpu.examples.demo_vis_pcd -e PushCube-v1 -o /tmp/pcd.ply
"""
from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--env-id", default="PushCube-v1")
    p.add_argument("-o", "--output", default="/tmp/pcd.ply")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def write_ply(path, xyz, rgb):
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(xyz)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        for p, c in zip(xyz, rgb):
            f.write(f"{p[0]:.5f} {p[1]:.5f} {p[2]:.5f} {c[0]} {c[1]} {c[2]}\n")


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make

    env = make(args.env_id, num_envs=1, obs_mode="pointcloud")
    base = env.unwrapped
    obs, _ = env.reset(seed=args.seed)
    act = jnp.zeros((1,) + base.single_action_space.shape, jnp.float32)
    for _ in range(args.steps):
        obs, *_ = env.step(act)
    pcd = obs["pointcloud"]
    xyzw = np.asarray(pcd["xyzw"][0])
    rgb = np.asarray(pcd["rgb"][0])
    valid = xyzw[:, 3] > 0
    xyz = xyzw[valid, :3]
    rgb = rgb[valid]
    print(f"{valid.sum()} foreground points")
    if args.output.endswith(".ply"):
        write_ply(args.output, xyz, rgb)
    else:
        np.save(args.output, np.concatenate([xyz, rgb], axis=-1))
    print(f"wrote {args.output}")
    env.close()


if __name__ == "__main__":
    main()

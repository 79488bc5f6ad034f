"""Render throughput benchmark (reference table: CartpoleBalanceBenchmark-v1
RGB 128x128 @1024 envs = 32,138 fps on RTX 4090).

Usage: python -m maniskill_tpu.examples.benchmarking.bench_render [-n 1024]
"""
from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-n", "--num-envs", type=int, default=1024)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--steps", type=int, default=60)
    p.add_argument("--obs-mode", default="rgb")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make

    env = make(
        "CartpoleBalanceBenchmark-v1",
        num_envs=args.num_envs,
        obs_mode=args.obs_mode,
        sensor_configs=dict(width=args.width, height=args.height),
    )
    base = env.unwrapped
    obs, _ = env.reset(seed=0)
    act = jnp.zeros((args.num_envs,) + base.single_action_space.shape, jnp.float32)

    obs, *_ = env.step(act)  # compile
    jax.block_until_ready(obs["sensor_data"]["base_camera_0"]["rgb"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        obs, *_ = env.step(act)
    jax.block_until_ready(obs["sensor_data"]["base_camera_0"]["rgb"])
    dt = time.perf_counter() - t0
    fps = args.num_envs * args.steps / dt
    print(
        json.dumps(
            dict(
                metric=f"cartpole_{args.obs_mode}_{args.width}x{args.height}_fps",
                value=round(fps, 1),
                unit="env*frames/s",
                vs_baseline=round(fps / 32138.0, 3),
            )
        )
    )


if __name__ == "__main__":
    main()

"""Terminal keyboard teleoperation (counterpart of
mani_skill/examples/teleoperation/interactive_panda.py, which uses the
sapien viewer + drag gizmos).

Headless-friendly: raw-tty WASD/arrow keys drive pd_ee_delta_pos actions;
each step prints TCP pose + task status, and frames can be dumped as PNGs.

Keys: w/s = +-x, a/d = +-y, r/f = +-z, g = toggle gripper,
      x = reset, q = quit.

Usage:
    python -m maniskill_tpu.examples.teleoperation.interactive_panda \
        --env-id PickCube-v1 [--save-frames /tmp/frames]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_KEY_DELTAS = {
    "w": (1, 0, 0), "s": (-1, 0, 0),
    "a": (0, 1, 0), "d": (0, -1, 0),
    "r": (0, 0, 1), "f": (0, 0, -1),
}


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PickCube-v1")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--speed", type=float, default=1.0, help="delta scale (x0.1 m)")
    p.add_argument("--save-frames", default=None)
    return p.parse_args(argv)


def _read_key() -> str:
    import termios
    import tty

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setraw(fd)
        return sys.stdin.read(1)
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make

    render = bool(args.save_frames)
    env = make(
        args.env_id, num_envs=1, obs_mode="state",
        control_mode="pd_ee_target_delta_pos",
        render_mode="rgb_array" if render else None,
    )
    base = env.unwrapped
    env.reset(seed=args.seed)
    if args.save_frames:
        os.makedirs(args.save_frames, exist_ok=True)

    gripper = 1.0
    t = 0
    print(__doc__.split("Keys:")[1].split("Usage:")[0])
    while True:
        key = _read_key()
        if key in ("q", "\x03"):
            break
        if key == "x":
            env.reset(seed=args.seed)
            t = 0
            continue
        if key == "g":
            gripper = -gripper
        delta = np.array(_KEY_DELTAS.get(key, (0, 0, 0)), np.float32) * args.speed
        action = np.concatenate([delta, [gripper]]).astype(np.float32)
        obs, rew, term, trunc, info = env.step(action)
        t += 1
        tcp = np.asarray(base.agent.tcp.pose.p[0])
        succ = bool(np.asarray(info.get("success", term))[0])
        print(
            f"step {t} tcp=[{tcp[0]:+.3f} {tcp[1]:+.3f} {tcp[2]:+.3f}] "
            f"grip={'open' if gripper > 0 else 'closed'} reward={float(np.asarray(rew)[0]):.3f} "
            f"success={succ}",
            flush=True,
        )
        if args.save_frames:
            frame = np.asarray(env.render()[0])
            try:
                from PIL import Image

                Image.fromarray(frame).save(f"{args.save_frames}/{t:05d}.png")
            except ImportError:
                np.save(f"{args.save_frames}/{t:05d}.npy", frame)
    env.close()


if __name__ == "__main__":
    main()

"""Manual-control demo CLI (counterpart of
mani_skill/examples/demo_manual_control.py, which drives one env with
keyboard shortcuts in the sapien viewer).

Headless-friendly: for EE-controlled arms the WASD/RF keys drive
pd_ee_delta_pos like the reference's translation keys; for any other
control mode, number keys select an action dimension and +/- nudge it.

Keys (EE mode): w/s = +-x, a/d = +-y, r/f = +-z, g = toggle gripper
Keys (generic): 0-9 select dim, +/- nudge, 0 action otherwise
Common: x = reset, q = quit.

Usage:
    python -m maniskill_tpu.examples.demo_manual_control -e PushCube-v1
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--env-id", default="PushCube-v1")
    p.add_argument("-c", "--control-mode", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--save-frames", default=None)
    return p.parse_args(argv)


def _read_key() -> str:
    import termios
    import tty

    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    try:
        tty.setraw(fd)
        ch = sys.stdin.read(1)
    finally:
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
    return ch


_EE_KEYS = {
    "w": (1, 0, 0), "s": (-1, 0, 0),
    "a": (0, 1, 0), "d": (0, -1, 0),
    "r": (0, 0, 1), "f": (0, 0, -1),
}


def main(argv=None):
    args = parse_args(argv)
    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make

    control_mode = args.control_mode
    env = make(
        args.env_id, num_envs=1, control_mode=control_mode,
        render_mode="rgb_array" if args.save_frames else None,
    )
    base = env.unwrapped
    act_dim = int(np.prod(base.single_action_space.shape))
    mode = base.control_mode or ""
    ee = "ee_delta_pos" in mode
    env.reset(seed=args.seed)
    print(f"control mode {mode}, action dim {act_dim}; q to quit")
    gripper, dim, t = 1.0, 0, 0
    while True:
        ch = _read_key()
        if ch in ("q", "\x03"):
            break
        if ch == "x":
            env.reset()
            continue
        action = np.zeros(act_dim, np.float32)
        if ee:
            if ch == "g":
                gripper = -gripper
            elif ch in _EE_KEYS:
                action[:3] = _EE_KEYS[ch]
            action[-1] = gripper
        else:
            if ch.isdigit():
                dim = min(int(ch), act_dim - 1)
                print(f"selected dim {dim}")
                continue
            if ch in ("+", "="):
                action[dim] = 1.0
            elif ch == "-":
                action[dim] = -1.0
        obs, rew, term, trunc, info = env.step(action[None])
        t += 1
        print(
            f"t={t} reward {float(np.asarray(rew)[0]):.3f} "
            f"success {bool(np.asarray(info.get('success', False)).any())}"
        )
        if args.save_frames:
            import os

            os.makedirs(args.save_frames, exist_ok=True)
            frame = np.asarray(env.render())[0]
            try:
                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                plt.imsave(f"{args.save_frames}/{t:04d}.png", frame)
            except Exception:
                pass
    env.close()


if __name__ == "__main__":
    main()

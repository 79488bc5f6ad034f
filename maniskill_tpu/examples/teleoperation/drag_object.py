"""Object-drag teleoperation via 6-dof drives (counterpart of the
reference's viewer click-drag gizmos, examples/teleoperation/*).

A world-anchored spring-damper drive (structs/drive.py) attaches to a
chosen actor; WASD/rf keys move the drive target and the object follows
physically (contacts and all) instead of teleporting.

Keys: w/s = +-x, a/d = +-y, r/f = +-z, x = reset, q = quit.

Usage:
    python -m maniskill_tpu.examples.teleoperation.drag_object \
        --env-id PushCube-v1 --actor cube [--save-frames /tmp/frames]
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
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--actor", default="cube")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--speed", type=float, default=0.02, help="target step (m)")
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


class _DragEnvFactory:
    """Builds the env with a world-anchored drive on the chosen actor by
    hooking _load_scene (drives must exist before model finalize)."""

    def __init__(self, env_id, actor_name):
        from maniskill_tpu.utils.registration import REGISTERED_ENVS

        spec = REGISTERED_ENVS[env_id]
        base_cls = spec.cls
        factory = self

        class DragEnv(base_cls):
            def _load_scene(self, options):
                super()._load_scene(options)
                target = self.scene.actors[actor_name]
                factory.drive = self.scene.create_drive(
                    None, None, target, None,
                    stiffness=(300.0, 5.0), damping=(30.0, 0.5),
                    force_limit=(30.0, 2.0),
                )

        self.cls = DragEnv


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401

    factory = _DragEnvFactory(args.env_id, args.actor)
    render = bool(args.save_frames)
    env = factory.cls(
        num_envs=1, obs_mode="state",
        render_mode="rgb_array" if render else None,
    )
    env.reset(seed=args.seed)
    drive = factory.drive
    target = np.asarray(env.scene.actors[args.actor].pose.p[0]).copy()
    drive.set_drive_target(jnp.asarray(np.concatenate([target, [1, 0, 0, 0]])))
    if args.save_frames:
        os.makedirs(args.save_frames, exist_ok=True)

    act = jnp.zeros((1,) + env.single_action_space.shape, jnp.float32)
    t = 0
    print(__doc__.split("Keys:")[1].split("Usage:")[0])
    while True:
        key = _read_key()
        if key in ("q", "\x03"):
            break
        if key == "x":
            env.reset(seed=args.seed)
            target = np.asarray(env.scene.actors[args.actor].pose.p[0]).copy()
        delta = np.array(_KEY_DELTAS.get(key, (0, 0, 0)), np.float32) * args.speed
        target = target + delta
        drive.set_drive_target(
            jnp.asarray(np.concatenate([target, [1, 0, 0, 0]]))
        )
        env.step(act)
        t += 1
        p = np.asarray(env.scene.actors[args.actor].pose.p[0])
        print(
            f"step {t} target=[{target[0]:+.3f} {target[1]:+.3f} {target[2]:+.3f}] "
            f"obj=[{p[0]:+.3f} {p[1]:+.3f} {p[2]:+.3f}]",
            flush=True,
        )
        if args.save_frames:
            frame = np.asarray(env.render()[0])
            np.save(f"{args.save_frames}/{t:05d}.npy", frame)
    env.close()


if __name__ == "__main__":
    main()

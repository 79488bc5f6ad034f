"""Interactive teleoperation (counterpart of
mani_skill/examples/teleoperation/interactive_panda.py, which uses the
sapien viewer + drag gizmos).

Two headless-friendly front ends:
- terminal (default): raw-tty WASD keys drive pd_ee_delta_pos actions and
  each step prints TCP pose + task status; frames can be dumped as PNGs.
- ``--browser PORT``: serves the human render camera as a live MJPEG
  stream; keyboard + click-drag + wheel in the browser drive the EE
  (viewer/server.py — the sapien.utils.Viewer analog). Pass
  ``--record-dir`` to save the teleoperated episode as a demo trajectory.

Keys: w/s = +-x, a/d = +-y, r/f = +-z, g = toggle gripper,
      x = reset, q = quit.

Usage:
    python -m maniskill_tpu.examples.teleoperation.interactive_panda \
        --env-id PickCube-v1 [--save-frames /tmp/frames]
    python -m maniskill_tpu.examples.teleoperation.interactive_panda \
        --env-id PickCube-v1 --browser 8400 [--record-dir demos/teleop]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

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
    p.add_argument("--browser", type=int, default=None, metavar="PORT",
                   help="serve a browser viewer on this port instead of tty")
    p.add_argument("--record-dir", default=None,
                   help="save teleoperated episodes as demo trajectories "
                        "(browser mode)")
    p.add_argument("--max-steps", type=int, default=0,
                   help="browser mode: stop after N steps (0 = run forever)")
    return p.parse_args(argv)


def browser_main(args):
    """Browser-viewer loop: stream frames out, drain input events, step."""
    import numpy as np

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.viewer import BrowserViewer

    env = make(
        args.env_id, num_envs=1, obs_mode="state",
        control_mode="pd_ee_target_delta_pos", render_mode="rgb_array",
    )
    if args.record_dir:
        from maniskill_tpu.wrappers.record import RecordEpisode

        env = RecordEpisode(env, args.record_dir, save_trajectory=True,
                            save_video=False)
    base = env.unwrapped
    env.reset(seed=args.seed)
    viewer = BrowserViewer(port=args.browser)
    print(f"viewer: http://localhost:{viewer.port}  (q in browser quits)")

    gripper, t, running = 1.0, 0, True
    viewer.push_frame(np.asarray(env.render()[0]))
    while running:
        delta = np.zeros(3, np.float32)
        moved = False
        for ev in viewer.poll_events():
            if ev.get("type") == "key":
                k = ev.get("key", "")
                if k == "q":
                    running = False
                elif k == "x":
                    env.reset(seed=args.seed)
                    t = 0
                    moved = True
                elif k == "g":
                    gripper = -gripper
                    moved = True
                else:
                    delta += np.array(
                        _KEY_DELTAS.get(k, (0, 0, 0)), np.float32
                    )
                    moved = moved or k in _KEY_DELTAS
            elif ev.get("type") == "drag":
                # camera-plane drag: browser x ~ world -y, browser y ~ world -x
                delta += np.array(
                    [-ev.get("dy", 0.0) * 2.0, -ev.get("dx", 0.0) * 2.0, 0.0],
                    np.float32,
                )
                moved = True
            elif ev.get("type") == "wheel":
                delta += np.array([0, 0, -0.3 * ev.get("dz", 0)], np.float32)
                moved = True
        if not moved:
            time.sleep(0.02)
            continue
        action = np.concatenate(
            [np.clip(delta, -1, 1) * args.speed, [gripper]]
        ).astype(np.float32)
        obs, rew, term, trunc, info = env.step(action)
        t += 1
        viewer.push_frame(np.asarray(env.render()[0]))
        tcp = np.asarray(base.agent.tcp.pose.p[0])
        viewer.set_status(dict(
            step=t,
            tcp=[round(float(v), 3) for v in tcp],
            gripper="open" if gripper > 0 else "closed",
            reward=round(float(np.asarray(rew)[0]), 3),
            success=bool(np.asarray(info.get("success", term))[0]),
        ))
        if args.max_steps and t >= args.max_steps:
            running = False
    env.close()
    viewer.close()


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
    if args.browser is not None:
        return browser_main(args)

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

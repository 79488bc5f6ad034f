"""Trajectory replay CLI (counterpart of
mani_skill/trajectory/replay_trajectory.py:35-480).

Replays recorded trajectories through an env — by stored actions or by
restoring stored env states — optionally converting the control mode
(pd_joint_pos recordings -> pd_joint_delta_pos / pd_ee_delta_pos /
pd_ee_delta_pose via FK of the commanded targets, replay_trajectory.py's
from_pd_joint_pos conversion), retrying stochastic replays up to
``--max-retry`` times, batching episodes over ``--num-envs`` parallel envs,
and re-recording with a different obs_mode for dataset regeneration.

Usage:
    python -m maniskill_tpu.trajectory.replay_trajectory \
        --traj-path out/traj.h5 [--obs-mode rgb] [--use-env-states] \
        [--control-mode pd_ee_delta_pose] [--max-retry 3] [--num-envs 16]
"""
from __future__ import annotations

import argparse
import json
import os

import h5py
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--traj-path", required=True)
    p.add_argument("--obs-mode", default=None)
    p.add_argument("--control-mode", default=None, help=(
        "target control mode; recordings made with pd_joint_pos can be "
        "converted to pd_joint_delta_pos / pd_ee_delta_pos / pd_ee_delta_pose"
    ))
    p.add_argument("--use-env-states", action="store_true")
    p.add_argument("--save-traj", action="store_true")
    p.add_argument("--save-video", action="store_true")
    p.add_argument("--output-dir", default=None)
    p.add_argument("--num-episodes", type=int, default=None)
    p.add_argument("--max-retry", type=int, default=0,
                   help="re-attempt an unsuccessful episode up to N times")
    p.add_argument("--num-envs", type=int, default=1,
                   help=">1 batches episodes across parallel envs "
                        "(GPU-parallel replay parity)")
    return p.parse_args(argv)


def _nested_to_arrays(g):
    if isinstance(g, h5py.Dataset):
        return g[()]
    return {k: _nested_to_arrays(v) for k, v in g.items()}


def _index_nested(d, i):
    if isinstance(d, dict):
        return {k: _index_nested(v, i) for k, v in d.items()}
    return d[i]


def _to_jnp(d, batch=False):
    import jax.numpy as jnp

    if isinstance(d, dict):
        return {k: _to_jnp(v, batch) for k, v in d.items()}
    a = jnp.asarray(d)
    return a[None] if batch else a


class _ActionConverter:
    """Converts pd_joint_pos actions to another control mode on the fly.

    The source action is the commanded absolute qpos target; the converted
    action reproduces that target under the new controller:
      - pd_joint_delta_pos: delta = target - current qpos, un-scaled into
        the normalized action range.
      - pd_ee_delta_pos(e): FK of the arm target -> desired EE pose; delta
        from the current EE pose, un-scaled. Orientation delta via
        axis-angle (pd_ee_delta_pose only).
    """

    def __init__(self, env, source_mode: str, target_mode: str):
        self.base = env.unwrapped
        self.agent = self.base.agent
        self.target_mode = target_mode
        if source_mode != "pd_joint_pos":
            raise ValueError(
                f"can only convert from pd_joint_pos recordings, got {source_mode}"
            )
        ctrl = self.agent.controller
        self.sub = getattr(ctrl, "controllers", {})
        self.arm = self.sub.get("arm")
        self.gripper = self.sub.get("gripper")

    def __call__(self, action: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from ..utils.geometry import rotation_conversions as rc

        action = np.asarray(action, np.float32)
        if action.ndim == 1:
            action = action[None]
        n_arm = len(self.arm.joints) if self.arm is not None else action.shape[-1]
        q_target = jnp.asarray(action[..., :n_arm])
        grip = action[..., n_arm:]

        if self.target_mode == "pd_joint_delta_pos":
            cur = self.agent.robot.qpos[..., :n_arm]
            delta = np.asarray(q_target - cur)
            lo, hi = self.arm.config.lower, self.arm.config.upper
            out = np.clip(delta / max(abs(lo), abs(hi)), -1, 1)
        elif self.target_mode in ("pd_ee_delta_pos", "pd_ee_delta_pose"):
            ee = self.sub["arm"]
            # FK of the commanded qpos -> desired EE pose
            ee._setup_kinematics()
            kin = ee.kinematics
            data_fk = kin._fk(q_target)
            eb = kin.end_link.body_id
            tgt_p, tgt_q = data_fk.xpos[:, eb], data_fk.xquat[:, eb]
            cur = self.agent.tcp_pose
            dp = np.asarray(tgt_p - cur.p)
            scale = abs(ee.config.pos_lower)
            out = np.clip(dp / scale, -1, 1)
            if self.target_mode == "pd_ee_delta_pose":
                dq = rc.quaternion_multiply(
                    tgt_q, rc.quaternion_invert(cur.q)
                )
                aa = np.asarray(rc.quaternion_to_axis_angle(dq))
                rot_scale = abs(ee.config.rot_lower)
                out = np.concatenate([out, np.clip(aa / rot_scale, -1, 1)], -1)
        else:
            raise ValueError(f"unsupported target control mode {self.target_mode}")
        return np.concatenate([out, grip], axis=-1)


def _replay_batched(env, h5, episodes, args):
    """Batch episodes across parallel envs: one reset with per-env seeds,
    stacked actions per step (replay_trajectory.py:111-249 parity)."""
    base = env.unwrapped
    B = base.num_envs
    n_success = 0
    for i0 in range(0, len(episodes), B):
        group = episodes[i0 : i0 + B]
        trajs = [h5[f"traj_{ep['episode_id']}"] for ep in group]
        acts = [t["actions"][()] for t in trajs]
        T = max(len(a) for a in acts)
        D = acts[0].shape[-1]
        seeds = []
        for ep in group:
            s = ep.get("episode_seed")
            seeds.append(int(s[0] if isinstance(s, list) else (s or 0)))
        seeds += [seeds[-1]] * (B - len(group))
        env.reset(seed=seeds)
        done_success = np.zeros(B, bool)
        for t in range(T):
            step_act = np.zeros((B, D), np.float32)
            for j, a in enumerate(acts):
                step_act[j] = a[min(t, len(a) - 1)]
            obs, rew, term, trunc, info = env.step(step_act)
            succ = np.asarray(info.get("success", np.zeros(B, bool)))
            for j, a in enumerate(acts):
                if t == len(a) - 1:
                    done_success[j] = bool(succ[j])
        for j, ep in enumerate(group):
            print(f"episode {ep['episode_id']}: success={bool(done_success[j])}")
            n_success += int(done_success[j])
    return n_success


def main(argv=None):
    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.wrappers.record import RecordEpisode

    args = parse_args(argv)
    h5 = h5py.File(args.traj_path, "r")
    json_path = args.traj_path.replace(".h5", ".json")
    with open(json_path) as f:
        meta = json.load(f)

    env_info = meta["env_info"]
    env_kwargs = dict(env_info.get("env_kwargs", {}))
    source_mode = env_kwargs.get("control_mode")
    if args.obs_mode:
        env_kwargs["obs_mode"] = args.obs_mode
    convert = None
    if args.control_mode and args.control_mode != source_mode:
        env_kwargs["control_mode"] = args.control_mode
    env_kwargs["num_envs"] = args.num_envs
    env = make(env_info["env_id"], **env_kwargs)
    if args.control_mode and args.control_mode != source_mode:
        convert = _ActionConverter(env, source_mode, args.control_mode)

    out_dir = args.output_dir or os.path.dirname(args.traj_path) or "."
    if args.save_traj or args.save_video:
        env = RecordEpisode(
            env, out_dir, save_trajectory=args.save_traj,
            save_video=args.save_video,
            trajectory_name=os.path.basename(args.traj_path).replace(".h5", "")
            + ".replay",
        )

    episodes = meta["episodes"]
    if args.num_episodes:
        episodes = episodes[: args.num_episodes]

    if args.num_envs > 1 and not args.use_env_states and convert is None:
        n_success = _replay_batched(env, h5, episodes, args)
        print(f"replayed {len(episodes)} episodes, success={n_success}")
        env.close()
        return

    n_success = 0
    for ep in episodes:
        traj = h5[f"traj_{ep['episode_id']}"]
        seed = ep.get("episode_seed")
        if isinstance(seed, list):
            seed = seed[0] if seed else None
        actions = traj["actions"][()]
        env_states = (
            _nested_to_arrays(traj["env_states"]) if "env_states" in traj else None
        )
        base = env.unwrapped
        success = False
        for attempt in range(args.max_retry + 1):
            env.reset(seed=None if seed is None else int(seed))
            info = {}
            state_err = 0.0
            for t in range(len(actions)):
                if args.use_env_states and env_states is not None:
                    state_t = _index_nested(env_states, t + 1)
                    base.set_state_dict(_to_jnp(state_t, batch=True))
                    obs, rew, term, trunc, info = env.step(actions[t])
                else:
                    act = convert(actions[t]) if convert is not None else actions[t]
                    obs, rew, term, trunc, info = env.step(act)
            if args.use_env_states and env_states is not None:
                # success = the restored final state matches the recording
                final = _index_nested(env_states, len(actions))
                got = base.get_state_dict()

                def _max_err(a, b):
                    if isinstance(a, dict):
                        return max(
                            (_max_err(a[k], b[k]) for k in a), default=0.0
                        )
                    return float(
                        np.max(np.abs(np.asarray(a) - np.asarray(b)[0]))
                        if np.asarray(b).ndim > np.asarray(a).ndim
                        else np.max(np.abs(np.asarray(a) - np.asarray(b)))
                    )

                state_err = _max_err(final, got)
                success = state_err < 1e-3
            else:
                success = bool(np.asarray(info.get("success", False)).reshape(-1)[0])
            if success:
                break
        n_success += int(success)
        print(f"episode {ep['episode_id']}: success={success}")
    print(f"replayed {len(episodes)} episodes, success={n_success}")
    env.close()


if __name__ == "__main__":
    main()

"""RecordEpisode wrapper (counterpart of mani_skill/utils/wrappers/record.py,
826 LoC): records trajectories to .h5 (nested obs, actions, terminated/
truncated, env_states, optional rewards) + JSON metadata, and saves videos.

Schema-compatible with the reference trajectory format: one h5 group
``traj_{i}`` per **episode** (per env — episodes are split per-env even under
GPU-style partial resets, mirroring record.py:55-826), with datasets actions
(T, D), terminated/truncated (T,), env_states (flattened dict, T+1), obs
(optional, T+1), rewards (optional, T); metadata JSON with episodes list
(episode_id, seed, control_mode, elapsed_steps, success/fail) and env info.
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict, List, Optional

import gymnasium as gym
import h5py
import numpy as np

from ..utils import common
from ..utils.visualization import images_to_video, tile_images


def _dict_to_group(group, data: Dict, key: str):
    if isinstance(data, dict):
        sub = group.create_group(key) if key not in group else group[key]
        for k, v in data.items():
            _dict_to_group(sub, v, k)
    else:
        group.create_dataset(key, data=np.asarray(data))


def _slice_env(item, i: int):
    """Index env i out of a nested dict of batched arrays."""
    if isinstance(item, dict):
        return {k: _slice_env(v, i) for k, v in item.items()}
    return np.asarray(item)[i]


def _stack_nested(items: List):
    if not items:
        return {}
    if isinstance(items[0], dict):
        return {k: _stack_nested([it[k] for it in items]) for k in items[0]}
    return np.stack([np.asarray(it) for it in items])


class RecordEpisode(gym.Wrapper):
    def __init__(
        self,
        env,
        output_dir: str,
        save_trajectory: bool = True,
        trajectory_name: Optional[str] = None,
        save_video: bool = True,
        info_on_video: bool = False,
        save_on_reset: bool = True,
        max_steps_per_video: Optional[int] = None,
        video_fps: int = 30,
        source_type: Optional[str] = None,
        source_desc: Optional[str] = None,
        record_reward: bool = True,
    ):
        super().__init__(env)
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.save_trajectory = save_trajectory
        self.save_video = save_video
        self.save_on_reset = save_on_reset
        self.max_steps_per_video = max_steps_per_video
        self.video_fps = video_fps
        self.record_reward = record_reward
        self._video_id = 0

        base = env.unwrapped
        self.num_envs = base.num_envs

        if trajectory_name is None:
            trajectory_name = time.strftime("%Y%m%d_%H%M%S")
        self._h5_path = self.output_dir / f"{trajectory_name}.h5"
        self._json_path = self.output_dir / f"{trajectory_name}.json"
        self._h5_file = None
        self._json_data = dict(
            env_info=dict(
                env_id=getattr(base, "uid", type(base).__name__),
                max_episode_steps=getattr(env, "max_episode_steps", None),
                env_kwargs=dict(
                    num_envs=self.num_envs,
                    obs_mode=base.obs_mode,
                    control_mode=base.control_mode,
                    reward_mode=base.reward_mode,
                ),
            ),
            episodes=[],
        )
        self._episode_id = -1
        self._clear_buffer()
        self._video_frames: List[np.ndarray] = []

    # ------------------------------------------------------------------
    def _clear_buffer(self):
        # Per-step lists of batched (B, ...) records. obs/states hold T+1
        # entries (the leading reset snapshot plus one per step); the others
        # hold T. ``_t0`` is the global index of the first retained timestep
        # (leading entries are trimmed once no live episode needs them);
        # ``_ep_start[i]`` is the global step index where env i's current
        # episode began.
        self._actions: List = []
        self._rewards: List = []
        self._terminated: List = []
        self._truncated: List = []
        self._success: List = []
        self._fail: List = []
        self._states: List = []
        self._obs: List = []
        self._t0 = 0
        self._ep_start = np.zeros(self.num_envs, np.int64)
        self._ep_seeds = [None] * self.num_envs

    @property
    def _t(self) -> int:
        """Global count of recorded steps since the last full clear."""
        return self._t0 + len(self._actions)

    def _record_snapshot(self, obs, partial_idx=None):
        """Append (or patch, for partial resets) the obs/state snapshot."""
        base = self.env.unwrapped
        state = common.to_numpy(base.get_state_dict())
        obs_np = common.to_numpy(obs)
        if partial_idx is None or not self._states:
            self._states.append(state)
            self._obs.append(obs_np)
        else:
            # Partial reset mid-stream: the latest snapshot (post-step) is
            # replaced for the reset envs with the post-reset values so the
            # next episodes of those envs start from the correct state.
            idx = np.asarray(partial_idx)

            def patch(old, new):
                if isinstance(old, dict):
                    return {k: patch(old[k], new[k]) for k in old}
                old = np.array(old)
                old[idx] = np.asarray(new)[idx]
                return old

            self._states[-1] = patch(self._states[-1], state)
            self._obs[-1] = patch(self._obs[-1], obs_np)

    # ------------------------------------------------------------------
    def reset(self, *, seed=None, options=None):
        options = options or {}
        env_idx = options.get("env_idx", None)
        if self.save_trajectory and self._actions:
            if env_idx is not None:
                flush_idx = np.asarray(env_idx)
            else:
                flush_idx = np.arange(self.num_envs)
            self.flush_trajectory(env_idx=flush_idx)
        if self.save_video and env_idx is None and self._video_frames:
            self.flush_video()

        obs, info = self.env.reset(seed=seed, options=options)
        base = self.env.unwrapped

        if env_idx is None:
            self._clear_buffer()
        if self.save_trajectory:
            self._record_snapshot(obs, partial_idx=env_idx)
            seeds = (
                np.asarray(base._episode_seeds).tolist()
                if hasattr(base, "_episode_seeds")
                else [None] * self.num_envs
            )
            targets = (
                range(self.num_envs) if env_idx is None else np.asarray(env_idx)
            )
            for i in targets:
                self._ep_start[i] = self._t
                self._ep_seeds[i] = seeds[i] if i < len(seeds) else None
        if self.save_video and env_idx is None:
            self._video_frames.append(self._render_frame())
        return obs, info

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        if self.save_trajectory:
            act = np.asarray(common.to_numpy(action))
            if act.ndim < 2:  # unbatched action: broadcast over envs (B, D)
                act = np.broadcast_to(
                    act.reshape(1, -1), (self.num_envs, act.size)
                )
            self._actions.append(act)
            self._rewards.append(np.asarray(common.to_numpy(reward)))
            self._terminated.append(np.asarray(common.to_numpy(terminated)))
            self._truncated.append(np.asarray(common.to_numpy(truncated)))
            self._success.append(
                np.asarray(common.to_numpy(info.get("success", np.zeros(self.num_envs, bool))))
            )
            self._fail.append(
                np.asarray(common.to_numpy(info.get("fail", np.zeros(self.num_envs, bool))))
            )
            self._record_snapshot(obs)
        if self.save_video:
            self._video_frames.append(self._render_frame())
            if (
                self.max_steps_per_video is not None
                and len(self._video_frames) >= self.max_steps_per_video
            ):
                self.flush_video()
        return obs, reward, terminated, truncated, info

    def _render_frame(self):
        img = self.env.render()
        img = np.asarray(common.to_numpy(img))
        if img.ndim == 4:  # (B, H, W, 3) -> tile
            img = tile_images(img)
        return img

    # ------------------------------------------------------------------
    def flush_trajectory(self, env_idx=None, save: bool = True):
        """Write finished episodes for the given envs (all envs if None)."""
        if not self.save_trajectory or not self._actions:
            return
        if env_idx is None:
            env_idx = np.arange(self.num_envs)
        if self._h5_file is None and save:
            self._h5_file = h5py.File(self._h5_path, "w")
        t_end = self._t
        for i in np.asarray(env_idx):
            i = int(i)
            start = int(self._ep_start[i])
            if t_end <= start:
                continue  # no steps recorded for this env's episode
            lo, hi = start - self._t0, t_end - self._t0
            self._episode_id += 1
            ep_len = hi - lo
            success = bool(self._success[hi - 1][i]) if self._success else False
            fail = bool(self._fail[hi - 1][i]) if self._fail else False
            if save:
                traj = self._h5_file.create_group(f"traj_{self._episode_id}")
                traj.create_dataset(
                    "actions", data=np.stack([a[i] for a in self._actions[lo:hi]])
                )
                traj.create_dataset(
                    "terminated",
                    data=np.stack([a[i] for a in self._terminated[lo:hi]]),
                )
                traj.create_dataset(
                    "truncated",
                    data=np.stack([a[i] for a in self._truncated[lo:hi]]),
                )
                traj.create_dataset("success", data=success)
                traj.create_dataset("fail", data=fail)
                if self.record_reward and self._rewards:
                    traj.create_dataset(
                        "rewards",
                        data=np.stack([a[i] for a in self._rewards[lo:hi]]),
                    )
                # env_states/obs include the leading reset snapshot: T+1 frames
                states = [_slice_env(s, i) for s in self._states[lo : hi + 1]]
                _dict_to_group(traj, _stack_nested(states), "env_states")
                obs = [o for o in (self._obs[lo : hi + 1])]
                obs_i = [_slice_env(o, i) for o in obs]
                if obs_i and not isinstance(obs_i[0], dict):
                    traj.create_dataset("obs", data=np.stack(obs_i))
                elif obs_i:
                    _dict_to_group(traj, _stack_nested(obs_i), "obs")
            self._json_data["episodes"].append(
                dict(
                    episode_id=self._episode_id,
                    episode_seed=self._ep_seeds[i],
                    control_mode=str(self.env.unwrapped.control_mode),
                    elapsed_steps=ep_len,
                    success=success,
                    fail=fail,
                )
            )
            self._ep_start[i] = t_end
        if save and self._h5_file is not None:
            with open(self._json_path, "w") as f:
                json.dump(self._json_data, f, indent=2, default=str)
            self._h5_file.flush()
        self._trim_buffer()

    def _trim_buffer(self):
        """Drop leading timesteps no live episode can reach anymore."""
        keep_from = int(min(self._ep_start)) if self.num_envs else self._t
        drop = keep_from - self._t0
        if drop <= 0:
            return
        for name in ("_actions", "_rewards", "_terminated", "_truncated", "_success", "_fail"):
            setattr(self, name, getattr(self, name)[drop:])
        self._states = self._states[drop:]
        self._obs = self._obs[drop:]
        self._t0 = keep_from

    def flush_video(self, save: bool = True, name: Optional[str] = None):
        if not self._video_frames:
            return
        frames = [f for f in self._video_frames if f is not None]
        if frames:
            name = name or f"{self._video_id}"
            images_to_video(
                frames, str(self.output_dir), video_name=name, fps=self.video_fps
            )
            self._video_id += 1
        self._video_frames = []

    def close(self):
        if self.save_on_reset:
            self.flush_trajectory()
            if self.save_video:
                self.flush_video()
        if self._h5_file is not None:
            self._h5_file.close()
            self._h5_file = None
        return super().close()

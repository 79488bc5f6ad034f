"""RecordEpisode wrapper (counterpart of mani_skill/utils/wrappers/record.py,
826 LoC): records trajectories to .h5 (nested obs, actions, terminated/
truncated, env_states, optional rewards) + JSON metadata, and saves videos.

Schema-compatible with the reference trajectory format: one h5 group
``traj_{i}`` per episode with datasets actions, terminated, truncated,
env_states (flattened dict), obs (optional), rewards (optional); metadata
JSON with episodes list (episode_id, seed, control_mode, elapsed_steps,
success/fail) and env info.
"""
from __future__ import annotations

import json
import os
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
    ):
        super().__init__(env)
        self.output_dir = Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        self.save_trajectory = save_trajectory
        self.save_video = save_video
        self.save_on_reset = save_on_reset
        self.max_steps_per_video = max_steps_per_video
        self.video_fps = video_fps
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
        self._buffer = None
        self._video_frames: List[np.ndarray] = []

    # ------------------------------------------------------------------
    def _init_buffer(self):
        self._buffer = dict(
            actions=[], rewards=[], terminated=[], truncated=[], states=[], obs=[]
        )

    def reset(self, *, seed=None, options=None):
        if self.save_on_reset and self._buffer is not None and len(self._buffer["actions"]):
            self.flush_trajectory()
            if self.save_video:
                self.flush_video()
        obs, info = self.env.reset(seed=seed, options=options)
        base = self.env.unwrapped
        self._episode_id += 1
        self._init_buffer()
        self._episode_seed = (
            np.asarray(base._episode_seeds).tolist()
            if hasattr(base, "_episode_seeds")
            else None
        )
        if self.save_trajectory:
            self._buffer["states"].append(common.to_numpy(base.get_state_dict()))
            self._buffer["obs"].append(common.to_numpy(obs))
        if self.save_video:
            self._video_frames.append(self._render_frame())
        return obs, info

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        if self.save_trajectory:
            base = self.env.unwrapped
            self._buffer["actions"].append(common.to_numpy(action))
            self._buffer["rewards"].append(np.asarray(reward))
            self._buffer["terminated"].append(np.asarray(terminated))
            self._buffer["truncated"].append(np.asarray(truncated))
            self._buffer["states"].append(common.to_numpy(base.get_state_dict()))
            self._buffer["obs"].append(common.to_numpy(obs))
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
    def flush_trajectory(self, save: bool = True):
        if not self.save_trajectory or self._buffer is None or not self._buffer["actions"]:
            return
        if self._h5_file is None:
            self._h5_file = h5py.File(self._h5_path, "w")
        traj = self._h5_file.create_group(f"traj_{self._episode_id}")
        traj.create_dataset("actions", data=np.stack(self._buffer["actions"]))
        traj.create_dataset("terminated", data=np.stack(self._buffer["terminated"]))
        traj.create_dataset("truncated", data=np.stack(self._buffer["truncated"]))
        if self._buffer["rewards"]:
            traj.create_dataset("rewards", data=np.stack(self._buffer["rewards"]))
        # env states: list of nested dicts -> stacked nested dict
        states = self._buffer["states"]
        stacked = _stack_nested(states)
        _dict_to_group(traj, stacked, "env_states")
        obs = self._buffer["obs"]
        if obs and not isinstance(obs[0], dict):
            traj.create_dataset("obs", data=np.stack(obs))
        elif obs:
            _dict_to_group(traj, _stack_nested(obs), "obs")

        term = np.stack(self._buffer["terminated"])
        self._json_data["episodes"].append(
            dict(
                episode_id=self._episode_id,
                episode_seed=self._episode_seed,
                control_mode=str(self.env.unwrapped.control_mode),
                elapsed_steps=len(self._buffer["actions"]),
                success=bool(term[-1].any()) if len(term) else False,
            )
        )
        with open(self._json_path, "w") as f:
            json.dump(self._json_data, f, indent=2, default=str)
        self._h5_file.flush()
        self._init_buffer()

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


def _stack_nested(items: List):
    if not items:
        return {}
    if isinstance(items[0], dict):
        return {k: _stack_nested([it[k] for it in items]) for k in items[0]}
    return np.stack([np.asarray(it) for it in items])

"""ManiSkillTrajectoryDataset (counterpart of
mani_skill/trajectory/dataset.py:23-154): iterates transitions from a
RecordEpisode .h5 file."""
from __future__ import annotations

from typing import Dict, List, Optional

import h5py
import numpy as np


def _load_h5_group(g) -> Dict:
    out = {}
    for k, v in g.items():
        if isinstance(v, h5py.Group):
            out[k] = _load_h5_group(v)
        else:
            out[k] = v[()]
    return out


class ManiSkillTrajectoryDataset:
    """Flat transition dataset over all episodes in a trajectory h5 file.

    Yields dicts with obs/action/reward/terminated/truncated per transition.
    Works as a plain python sequence (torch-free); wrap for your framework's
    loader as needed.
    """

    def __init__(self, dataset_file: str, load_count: Optional[int] = None, success_only: bool = False):
        self.dataset_file = dataset_file
        self.h5 = h5py.File(dataset_file, "r")
        import json
        import os

        json_path = dataset_file.replace(".h5", ".json")
        self.meta = None
        if os.path.exists(json_path):
            with open(json_path) as f:
                self.meta = json.load(f)

        self.episode_keys = sorted(
            [k for k in self.h5.keys() if k.startswith("traj_")],
            key=lambda s: int(s.split("_")[1]),
        )
        if load_count is not None:
            self.episode_keys = self.episode_keys[:load_count]

        self.actions: List[np.ndarray] = []
        self.obs: List = []
        self.rewards: List[np.ndarray] = []
        self.terminated: List[np.ndarray] = []
        self.truncated: List[np.ndarray] = []
        self._index: List = []
        for ek in self.episode_keys:
            g = self.h5[ek]
            acts = g["actions"][()]
            n = len(acts)
            ep = len(self.actions)
            self.actions.append(acts)
            self.terminated.append(g["terminated"][()])
            self.truncated.append(g["truncated"][()])
            if "rewards" in g:
                self.rewards.append(g["rewards"][()])
            if "obs" in g:
                self.obs.append(
                    g["obs"][()] if isinstance(g["obs"], h5py.Dataset) else _load_h5_group(g["obs"])
                )
            for t in range(n):
                self._index.append((ep, t))

    def __len__(self):
        return len(self._index)

    def __getitem__(self, i):
        ep, t = self._index[i]
        out = dict(
            action=self.actions[ep][t],
            terminated=self.terminated[ep][t],
            truncated=self.truncated[ep][t],
        )
        if self.rewards:
            out["reward"] = self.rewards[ep][t]
        if self.obs:
            o = self.obs[ep]
            if isinstance(o, dict):
                out["obs"] = _index_nested(o, t)
                out["next_obs"] = _index_nested(o, t + 1)
            else:
                out["obs"] = o[t]
                out["next_obs"] = o[t + 1]
        return out

    def close(self):
        self.h5.close()


def _index_nested(d, i):
    if isinstance(d, dict):
        return {k: _index_nested(v, i) for k, v in d.items()}
    return d[i]

"""Merge trajectory files (counterpart of
mani_skill/trajectory/merge_trajectory.py:1-97): combine multiple
RecordEpisode .h5/.json pairs, renumbering episodes."""
from __future__ import annotations

import argparse
import json

import h5py


def merge_trajectories(output_path: str, traj_paths, recompute_id: bool = True):
    out_h5 = h5py.File(output_path, "w")
    merged = dict(env_info=None, episodes=[])
    new_id = 0
    for path in traj_paths:
        h5 = h5py.File(path, "r")
        with open(path.replace(".h5", ".json")) as f:
            meta = json.load(f)
        if merged["env_info"] is None:
            merged["env_info"] = meta.get("env_info")
        for ep in meta["episodes"]:
            old = f"traj_{ep['episode_id']}"
            if old not in h5:
                continue
            tid = new_id if recompute_id else ep["episode_id"]
            h5.copy(old, out_h5, f"traj_{tid}")
            ep = dict(ep)
            ep["episode_id"] = tid
            merged["episodes"].append(ep)
            new_id += 1
        h5.close()
    out_h5.close()
    with open(output_path.replace(".h5", ".json"), "w") as f:
        json.dump(merged, f, indent=2, default=str)
    print(f"merged {new_id} episodes into {output_path}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-i", "--inputs", nargs="+", required=True)
    p.add_argument("-o", "--output", required=True)
    args = p.parse_args(argv)
    merge_trajectories(args.output, args.inputs)


if __name__ == "__main__":
    main()

"""Visualize segmentation obs (counterpart of
mani_skill/examples/demo_vis_segmentation.py): saves a color-mapped PNG per
camera plus the id->object legend."""
from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--env-id", default="PushCube-v1")
    p.add_argument("-o", "--out", default="seg.png")
    args = p.parse_args(argv)

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make

    env = make(args.env_id, num_envs=1, obs_mode="rgb+segmentation")
    obs, _ = env.reset(seed=0)
    base = env.unwrapped
    print("segmentation id map:")
    for name, actor in base.scene.actors.items():
        print(f"  {actor.per_scene_id}: actor {name}")
    for aname, art in base.scene.articulations.items():
        for link in art.links:
            print(f"  {link.per_scene_id}: link {aname}/{link.name}")

    cam = next(iter(obs["sensor_data"]))
    seg = np.asarray(obs["sensor_data"][cam]["segmentation"])[0, ..., 0]
    rgb = np.asarray(obs["sensor_data"][cam]["rgb"])[0]
    n = max(int(seg.max()), 1)
    rng = np.random.RandomState(0)
    palette = rng.randint(0, 255, size=(n + 1, 3), dtype=np.uint8)
    palette[0] = 0
    seg_rgb = palette[seg]
    try:
        import imageio

        imageio.imwrite(args.out, np.concatenate([rgb, seg_rgb], axis=1))
        print("wrote", args.out)
    except Exception as e:
        np.savez(args.out + ".npz", rgb=rgb, seg=seg)
        print("imageio unavailable; wrote npz:", e)
    env.close()


if __name__ == "__main__":
    main()

"""Texture-visualization demo CLI (counterpart of
mani_skill/examples/demo_vis_textures.py): renders every image-like texture
in the requested obs mode (rgb, depth, normal, albedo, segmentation in any
"+"-combination) and saves a tiled image per camera.

Usage:
    python -m maniskill_tpu.examples.demo_vis_textures -e PushCube-v1 \
        -o rgb+depth+normal --out textures.png
"""
from __future__ import annotations

import argparse

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-e", "--env-id", default="PushCube-v1")
    p.add_argument("-o", "--obs-mode", default="rgb+depth")
    p.add_argument("--shader", default="minimal")
    p.add_argument("--num-envs", type=int, default=1)
    p.add_argument("--cam-width", type=int, default=None)
    p.add_argument("--cam-height", type=int, default=None)
    p.add_argument("-s", "--seed", type=int, default=0)
    p.add_argument("--out", default="textures.png")
    return p.parse_args(argv)


def _to_rgb8(name: str, img: np.ndarray) -> np.ndarray:
    """Normalize any texture to an HxWx3 uint8 visualization."""
    if img.dtype == np.uint8 and img.shape[-1] == 3:
        return img
    img = np.asarray(img, np.float32)
    if img.shape[-1] == 1:  # depth (mm) or segmentation ids
        lo, hi = img.min(), img.max()
        gray = (img[..., 0] - lo) / max(hi - lo, 1e-6)
        return np.stack([gray * 255] * 3, axis=-1).astype(np.uint8)
    if "normal" in name:  # [-1, 1] -> rgb
        return ((img * 0.5 + 0.5) * 255).clip(0, 255).astype(np.uint8)
    return (img * 255).clip(0, 255).astype(np.uint8)[..., :3]


def main(argv=None):
    args = parse_args(argv)
    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils import common
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.utils.visualization import tile_images

    sensor_configs = dict(shader_pack=args.shader)
    if args.cam_width:
        sensor_configs["width"] = args.cam_width
    if args.cam_height:
        sensor_configs["height"] = args.cam_height
    env = make(
        args.env_id, num_envs=args.num_envs, obs_mode=args.obs_mode,
        sensor_configs=sensor_configs,
    )
    obs, _ = env.reset(seed=args.seed)
    obs = common.to_numpy(obs)
    tiles, names = [], []
    for cam, textures in sorted(obs.get("sensor_data", {}).items()):
        for name, img in sorted(textures.items()):
            tiles.append(_to_rgb8(name, np.asarray(img[0])))
            names.append(f"{cam}/{name}")
    env.close()
    print("textures:", ", ".join(names))
    tiled = tile_images(tiles)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(args.out, tiled)
        print(f"saved {args.out} ({tiled.shape})")
    except Exception:
        np.save(args.out + ".npy", tiled)
        print(f"matplotlib unavailable; saved raw array {args.out}.npy")


if __name__ == "__main__":
    main()

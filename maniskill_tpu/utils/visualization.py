"""Image/video helpers (counterpart of mani_skill/utils/visualization/misc.py)."""
from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def tile_images(images: np.ndarray, nrows: Optional[int] = None) -> np.ndarray:
    """Tile (B, H, W, C) into one image grid."""
    images = np.asarray(images)
    b, h, w, c = images.shape
    if nrows is None:
        nrows = int(np.floor(np.sqrt(b)))
    ncols = int(np.ceil(b / nrows))
    out = np.zeros((nrows * h, ncols * w, c), images.dtype)
    for i in range(b):
        r, cc = divmod(i, ncols)
        out[r * h : (r + 1) * h, cc * w : (cc + 1) * w] = images[i]
    return out


def images_to_video(
    images: List[np.ndarray],
    output_dir: str,
    video_name: str,
    fps: int = 30,
    quality: Optional[float] = 5,
    verbose: bool = False,
):
    import imageio

    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, f"{video_name}.mp4")
    writer_kwargs = dict(fps=fps)
    try:
        w = imageio.get_writer(path, **writer_kwargs)
        for im in images:
            w.append_data(np.asarray(im, np.uint8))
        w.close()
    except Exception:
        # fall back to stacked npz when no video backend exists
        np.savez_compressed(path.replace(".mp4", ".npz"), frames=np.stack(images))
    return path


def put_info_on_image(image, info: dict, extras=None, overlay=True):
    return image  # text overlay requires font rendering; no-op placeholder

"""Scene/pose helpers (counterpart of mani_skill/utils/sapien_utils.py).

``look_at`` follows the reference convention (sapien_utils.py:317): the
returned pose's +x axis points at the target, +z is up (ROS camera frame).
"""
from __future__ import annotations

import numpy as np

from ..structs.pose import Pose
from ..building.inertia import mat_to_quat_np


def look_at(eye, target, up=(0.0, 0.0, 1.0)) -> Pose:
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    n = np.linalg.norm(fwd)
    fwd = fwd / (n if n > 1e-9 else 1.0)
    up = np.asarray(up, np.float64)
    left = np.cross(up, fwd)
    if np.linalg.norm(left) < 1e-6:
        left = np.cross([0.0, 1.0, 0.0], fwd)
    left /= np.linalg.norm(left)
    true_up = np.cross(fwd, left)
    rot = np.stack([fwd, left, true_up], axis=1)  # columns: x=fwd, y=left, z=up
    quat = mat_to_quat_np(rot)
    return Pose.create(np.concatenate([eye, quat]).astype(np.float32))


# ROS camera frame (x fwd, z up) -> OpenGL camera frame (-z fwd, y up)
ROS_TO_GL = np.array(
    [
        [0.0, -1.0, 0.0],
        [0.0, 0.0, 1.0],
        [-1.0, 0.0, 0.0],
    ]
)
# OpenCV camera frame (z fwd, y down)
ROS_TO_CV = np.array(
    [
        [0.0, -1.0, 0.0],
        [0.0, 0.0, -1.0],
        [1.0, 0.0, 0.0],
    ]
)

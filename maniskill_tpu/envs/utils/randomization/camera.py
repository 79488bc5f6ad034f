"""Camera-pose randomization helpers.

Counterpart of mani_skill/envs/utils/randomization/camera.py:13-60
(`make_camera_rectangular_prism`, `noised_look_at`), reimplemented batched in
jax: eye positions sampled inside a rotated box, look-at targets and the
roll about the viewing axis perturbed with Gaussian noise. Used for
per-env camera-pose domain randomization (mounted or scene cameras).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ....structs.pose import Pose
from ....utils.geometry.rotation_conversions import (
    axis_angle_to_quaternion,
    matrix_to_quaternion,
    quaternion_multiply,
)


def batched_look_at(eye: jax.Array, target: jax.Array, up=(0.0, 0.0, 1.0)) -> Pose:
    """Batched look-at in the reference's ROS convention (+x at target, +z up).

    Mirrors sapien_utils.look_at (reference sapien_utils.py:317) but accepts
    (N, 3) arrays and stays on device (the host-side single-pose variant lives
    in utils/scene_utils.py).
    """
    eye = jnp.atleast_2d(jnp.asarray(eye, jnp.float32))
    target = jnp.atleast_2d(jnp.asarray(target, jnp.float32))
    eye, target = jnp.broadcast_arrays(eye, target)
    fwd = target - eye
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd, axis=-1, keepdims=True), 1e-9)
    upv = jnp.broadcast_to(jnp.asarray(up, jnp.float32), fwd.shape)
    left = jnp.cross(upv, fwd)
    # degenerate (fwd ∥ up): fall back to y as the up hint
    deg = jnp.linalg.norm(left, axis=-1, keepdims=True) < 1e-6
    alt = jnp.cross(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), fwd)
    left = jnp.where(deg, alt, left)
    left = left / jnp.maximum(jnp.linalg.norm(left, axis=-1, keepdims=True), 1e-9)
    true_up = jnp.cross(fwd, left)
    rot = jnp.stack([fwd, left, true_up], axis=-1)  # columns x=fwd, y=left, z=up
    return Pose.create_from_pq(eye, matrix_to_quaternion(rot))


def make_camera_rectangular_prism(
    key: jax.Array, n: int, scale=(0.1, 0.1, 0.1), center=(0, 0, 0), theta: float = 0.0
) -> jax.Array:
    """Sample n camera eye positions inside a z-rotated box.

    Matches reference randomization/camera.py:13-30: points uniform in a box
    of half-extents scale/2, rotated by theta about z, translated to center.
    """
    scale = jnp.asarray(scale, jnp.float32)
    center = jnp.asarray(center, jnp.float32)
    xyz = (jax.random.uniform(key, (n, 3)) - 0.5) * scale
    c, s = jnp.cos(theta), jnp.sin(theta)
    rot = jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    return xyz @ rot.T + center


def noised_look_at(
    key: jax.Array,
    eye: jax.Array,
    target,
    look_at_noise: float = 1e-2,
    view_axis_rot_noise: float = 2e-1,
) -> Pose:
    """Look-at poses with Gaussian noise on the target and on the roll about
    the viewing direction (reference randomization/camera.py:33-60).
    """
    eye = jnp.atleast_2d(jnp.asarray(eye, jnp.float32))
    n = eye.shape[0]
    target = jnp.broadcast_to(jnp.asarray(target, jnp.float32), (n, 3))
    k_t, k_r = jax.random.split(key)
    noised_targets = target + jax.random.normal(k_t, (n, 3)) * look_at_noise
    poses = batched_look_at(eye, noised_targets)
    angles = jax.random.normal(k_r, (n,)) * view_axis_rot_noise
    axes = noised_targets - eye
    unit_axes = axes / jnp.maximum(jnp.linalg.norm(axes, axis=-1, keepdims=True), 1e-9)
    roll_q = axis_angle_to_quaternion(unit_axes * angles[:, None])
    return Pose.create_from_pq(poses.p, quaternion_multiply(roll_q, poses.q))

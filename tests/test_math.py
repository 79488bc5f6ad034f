import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maniskill_tpu.utils.geometry import rotation_conversions as rc
from maniskill_tpu.structs.pose import Pose


def random_quats(n, seed=0):
    return rc.random_quaternions(jax.random.PRNGKey(seed), n)


def test_quat_matrix_roundtrip():
    q = random_quats(64)
    m = rc.quaternion_to_matrix(q)
    q2 = rc.matrix_to_quaternion(m)
    np.testing.assert_allclose(
        np.abs(np.sum(np.asarray(q) * np.asarray(q2), axis=-1)), 1.0, atol=1e-5
    )


def test_quat_apply_matches_matrix():
    q = random_quats(32, 1)
    v = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    out1 = rc.quaternion_apply(q, v)
    out2 = jnp.einsum("nij,nj->ni", rc.quaternion_to_matrix(q), v)
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_quat_multiply_compose():
    qa, qb = random_quats(16, 3), random_quats(16, 4)
    v = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
    lhs = rc.quaternion_apply(rc.quaternion_multiply(qa, qb), v)
    rhs = rc.quaternion_apply(qa, rc.quaternion_apply(qb, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_axis_angle_roundtrip():
    # keep |aa| < pi so the axis-angle representation is unique
    aa = jax.random.uniform(jax.random.PRNGKey(7), (32, 3), minval=-1.0, maxval=1.0)
    q = rc.axis_angle_to_quaternion(aa)
    aa2 = rc.quaternion_to_axis_angle(q)
    np.testing.assert_allclose(aa, aa2, atol=1e-4)


def test_axis_angle_small_angle():
    aa = jnp.array([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    q = rc.axis_angle_to_quaternion(aa)
    assert np.all(np.isfinite(np.asarray(q)))
    np.testing.assert_allclose(q[1], jnp.array([1.0, 0, 0, 0]), atol=1e-7)


def test_euler2quat_matches_transforms3d_convention():
    # sxyz euler: rotation about fixed x then y then z
    q = rc.euler2quat(np.pi / 2, 0.0, 0.0)
    v = jnp.array([0.0, 1.0, 0.0])
    out = rc.quaternion_apply(q, v)
    np.testing.assert_allclose(out, jnp.array([0.0, 0.0, 1.0]), atol=1e-6)
    q = rc.euler2quat(0.0, np.pi / 2, 0.0)
    out = rc.quaternion_apply(q, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(out, jnp.array([1.0, 0.0, 0.0]), atol=1e-6)


def test_pose_compose_inverse():
    key = jax.random.PRNGKey(11)
    p = jax.random.normal(key, (8, 3))
    q = random_quats(8, 12)
    pose = Pose.create_from_pq(p, q)
    ident = pose * pose.inv()
    np.testing.assert_allclose(ident.p, 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(ident.q[..., 0]), 1.0, atol=1e-5)


def test_pose_broadcasting():
    pose = Pose.create_from_pq(p=jnp.zeros((4, 3)), q=[1, 0, 0, 0])
    assert pose.raw_pose.shape == (4, 7)
    pose = Pose.create_from_pq(p=[1, 2, 3])
    assert pose.raw_pose.shape == (7,)


def test_pose_transform_matches_matrix():
    p = jax.random.normal(jax.random.PRNGKey(13), (8, 3))
    q = random_quats(8, 14)
    pose = Pose.create_from_pq(p, q)
    pts = jax.random.normal(jax.random.PRNGKey(15), (8, 3))
    out1 = pose.transform_point(pts)
    m = pose.to_transformation_matrix()
    out2 = jnp.einsum("nij,nj->ni", m[:, :3, :3], pts) + m[:, :3, 3]
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_quat_diff_rad():
    q0 = jnp.array([[1.0, 0, 0, 0]])
    q1 = rc.axis_angle_to_quaternion(jnp.array([[0.3, 0.0, 0.0]]))
    np.testing.assert_allclose(rc.quat_diff_rad(q0, q1), 0.3, atol=1e-5)


def test_camera_randomization_helpers():
    # reference randomization/camera.py:13-60: eyes in a rotated box,
    # noised look-at points +x roughly at the target with unit quaternions
    from maniskill_tpu.envs.utils.randomization import (
        make_camera_rectangular_prism,
        noised_look_at,
    )

    eyes = make_camera_rectangular_prism(
        jax.random.PRNGKey(0), 16, scale=[0.4, 0.4, 0.1], center=[0.5, 0.0, 0.6],
        theta=0.3,
    )
    assert eyes.shape == (16, 3)
    assert float(jnp.abs(eyes[:, 2] - 0.6).max()) <= 0.05 + 1e-6

    pose = noised_look_at(jax.random.PRNGKey(1), eyes, [0.1, 0.0, 0.1])
    np.testing.assert_allclose(jnp.linalg.norm(pose.q, axis=-1), 1.0, atol=1e-5)
    fwd = rc.quaternion_to_matrix(pose.q)[..., 0]
    want = jnp.asarray([0.1, 0.0, 0.1]) - eyes
    want = want / jnp.linalg.norm(want, axis=-1, keepdims=True)
    assert float((fwd * want).sum(-1).min()) > 0.95

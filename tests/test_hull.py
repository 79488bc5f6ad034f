"""Convex-hull collision pipeline tests.

The reference gets mesh collision from coacd convex decomposition + PhysX
convex shapes (mani_skill/utils/building/actor_builder.py:57-164); here the
pipeline is building/cooking.py (hull proxies + OBB-split decomposition) and
the support-function SAT narrowphase in physics/collision.py.
"""
import itertools

import jax
import numpy as np
import pytest

from maniskill_tpu import physics as phys
from maniskill_tpu.physics import make_data


def _box_mesh(center, half):
    c = np.asarray(center, float)
    h = np.asarray(half, float)
    vs = np.array(list(itertools.product(*[[-1, 1]] * 3)), float) * h + c
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    fs = []
    for a, b, cc, d in quads:
        fs += [(a, b, cc), (a, cc, d)]
    return vs, np.array(fs, np.int32)


def _l_mesh():
    v1, f1 = _box_mesh([0, 0, 0.05], [0.1, 0.05, 0.05])
    v2, f2 = _box_mesh([-0.05, 0, 0.15], [0.05, 0.05, 0.05])
    return np.concatenate([v1, v2]), np.concatenate([f1, f2 + len(v1)])


def _free_adrs(model):
    adr = np.asarray(model.body_q_adr)
    types = np.asarray(model.body_jnt_type)
    return [int(adr[i]) for i in range(len(types)) if types[i] == phys.FREE]


def _settle(model, qpos0, steps=300):
    data = make_data(model, 1, qpos0)
    st = jax.jit(lambda d: phys.step(model, d))
    d = phys.forward(model, data)
    for _ in range(steps):
        d = st(d)
    return np.asarray(d.qpos[0]), np.asarray(d.qvel[0])


def test_decompose_l_shape():
    from maniskill_tpu.building.cooking import HULL_MAX_VERTS, decompose_mesh, hull_face_dirs

    verts, faces = _l_mesh()
    parts = decompose_mesh(verts, faces, max_parts=8)
    assert 2 <= len(parts) <= 8  # concave -> must split
    for p in parts:
        assert p.shape == (HULL_MAX_VERTS, 3)
        d = hull_face_dirs(p)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)


def test_hull_rests_on_plane():
    from maniskill_tpu.envs.scene import ManiSkillScene

    verts, faces = _l_mesh()
    scene = ManiSkillScene(num_envs=1)
    b = scene.create_actor_builder()
    b.add_plane_collision()
    b.build_static(name="ground")
    b2 = scene.create_actor_builder()
    b2.add_multiple_convex_collisions_from_mesh(verts, faces)
    b2.set_initial_pose([0, 0, 0.3, 1, 0, 0, 0])
    b2.build(name="lshape")
    model = scene.finalize()
    qpos0 = phys.default_qpos(model)
    (qa,) = _free_adrs(model)
    qpos0[qa : qa + 7] = [0, 0, 0.3, 1, 0, 0, 0]
    qp, qv = _settle(model, qpos0)
    # mesh bottom is local z=0 -> body origin rests near the plane
    assert abs(qp[qa + 2]) < 0.02
    assert np.linalg.norm(qv) < 0.05


def test_hull_rests_on_box():
    from maniskill_tpu.envs.scene import ManiSkillScene

    verts, faces = _box_mesh([0, 0, 0], [0.05, 0.05, 0.05])
    scene = ManiSkillScene(num_envs=1)
    b = scene.create_actor_builder()
    b.add_box_collision(half_size=[0.1, 0.1, 0.05])
    b.set_initial_pose([0, 0, 0.05, 1, 0, 0, 0])
    b.build_static(name="pedestal")
    b2 = scene.create_actor_builder()
    b2.add_convex_collision_from_mesh(verts, faces)
    b2.set_initial_pose([0.02, 0, 0.3, 1, 0, 0, 0])
    b2.build(name="cube")
    model = scene.finalize()
    qpos0 = phys.default_qpos(model)
    (qa,) = _free_adrs(model)
    qpos0[qa : qa + 7] = [0.02, 0, 0.3, 1, 0, 0, 0]
    qp, qv = _settle(model, qpos0, steps=400)
    assert abs(qp[qa + 2] - 0.15) < 0.01
    assert np.linalg.norm(qv) < 0.1


def test_hull_hull_stack():
    from maniskill_tpu.envs.scene import ManiSkillScene

    verts, faces = _box_mesh([0, 0, 0], [0.05, 0.05, 0.05])
    scene = ManiSkillScene(num_envs=1)
    b = scene.create_actor_builder()
    b.add_plane_collision()
    b.build_static(name="ground")
    poses = [[0, 0, 0.05, 1, 0, 0, 0], [0, 0, 0.16, 1, 0, 0, 0]]
    for i, pose in enumerate(poses):
        bb = scene.create_actor_builder()
        bb.add_convex_collision_from_mesh(verts, faces)
        bb.set_initial_pose(pose)
        bb.build(name=f"c{i}")
    model = scene.finalize()
    qpos0 = phys.default_qpos(model)
    adrs = _free_adrs(model)
    for qa, pose in zip(adrs, poses):
        qpos0[qa : qa + 7] = pose
    qp, qv = _settle(model, qpos0, steps=400)
    assert abs(qp[adrs[0] + 2] - 0.05) < 0.01
    assert abs(qp[adrs[1] + 2] - 0.15) < 0.015
    assert np.linalg.norm(qv) < 0.1


def test_sphere_on_hull():
    from maniskill_tpu.envs.scene import ManiSkillScene

    verts, faces = _box_mesh([0, 0, 0], [0.1, 0.1, 0.05])
    scene = ManiSkillScene(num_envs=1)
    b = scene.create_actor_builder()
    b.add_plane_collision()
    b.build_static(name="ground")
    bb = scene.create_actor_builder()
    bb.add_convex_collision_from_mesh(verts, faces)
    bb.set_initial_pose([0, 0, 0.05, 1, 0, 0, 0])
    bb.build(name="slab")
    bs = scene.create_actor_builder()
    bs.add_sphere_collision(radius=0.03)
    bs.set_initial_pose([0, 0, 0.3, 1, 0, 0, 0])
    bs.build(name="ball")
    model = scene.finalize()
    qpos0 = phys.default_qpos(model)
    adrs = _free_adrs(model)
    qpos0[adrs[0] : adrs[0] + 7] = [0, 0, 0.05, 1, 0, 0, 0]
    qpos0[adrs[1] : adrs[1] + 7] = [0, 0, 0.3, 1, 0, 0, 0]
    qp, qv = _settle(model, qpos0, steps=400)
    # ball rests on the slab top (0.1) + radius
    assert abs(qp[adrs[1] + 2] - 0.13) < 0.012
    assert np.linalg.norm(qv) < 0.1

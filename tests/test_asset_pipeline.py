"""Asset pipeline tests: native mesh cooking + URDF loading."""
import os

import numpy as np
import pytest

from maniskill_tpu.native import fit_capsule, fit_obb, mesh_mass_properties
from maniskill_tpu.render.meshes import box_mesh, uv_sphere_mesh


def test_mass_properties_cube():
    v, f = box_mesh()
    vol, com, I = mesh_mass_properties(v.astype(np.float64), f)
    np.testing.assert_allclose(vol, 8.0, rtol=1e-6)
    np.testing.assert_allclose(com, 0.0, atol=1e-9)
    np.testing.assert_allclose(np.diag(I), 8.0 * 2.0 / 3.0, rtol=1e-6)


def test_mass_properties_sphere():
    v, f = uv_sphere_mesh(24, 48)
    vol, com, I = mesh_mass_properties(v.astype(np.float64), f)
    np.testing.assert_allclose(vol, 4.0 / 3.0 * np.pi, rtol=0.02)
    # I = 2/5 m r^2 with m = vol (unit density)
    np.testing.assert_allclose(np.diag(I), 0.4 * vol, rtol=0.03)


def test_fit_obb_rotated_box():
    rng = np.random.RandomState(0)
    half = np.array([0.3, 0.1, 0.05])
    pts = (rng.rand(2000, 3) * 2 - 1) * half
    # rotate by 30 deg about z
    a = np.deg2rad(30)
    R = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
    )
    pts = pts @ R.T + np.array([1.0, 2.0, 3.0])
    center, quat, fitted = fit_obb(pts)
    np.testing.assert_allclose(center, [1.0, 2.0, 3.0], atol=0.02)
    np.testing.assert_allclose(np.sort(fitted), np.sort(half), atol=0.02)


def test_fit_capsule_alignment():
    rng = np.random.RandomState(1)
    pts = rng.randn(1000, 3) * np.array([0.01, 0.01, 0.3])
    center, quat, r, hl = fit_capsule(pts)
    assert hl > 5 * r
    # capsule +z must align with the elongated direction (world z here)
    from maniskill_tpu.building.inertia import quat_to_mat_np

    z = quat_to_mat_np(quat) @ np.array([0, 0, 1.0])
    assert abs(z[2]) > 0.99


PANDA_URDF = "/root/reference/mani_skill/assets/robots/panda/panda_v2.urdf"


@pytest.mark.skipif(not os.path.exists(PANDA_URDF), reason="fixture URDF absent")
def test_urdf_loader_with_mesh_cooking():
    """Load a real mesh URDF end-to-end: meshes -> fitted primitives."""
    from maniskill_tpu.envs.scene import ManiSkillScene

    scene = ManiSkillScene(num_envs=1)
    loader = scene.create_urdf_loader()
    loader.name = "panda_urdf"
    loader.fix_root_link = True
    loader.disable_self_collisions = True
    robot = loader.load(PANDA_URDF)
    assert robot.dof == 9  # 7 arm + 2 fingers
    model = scene.finalize()
    # every link with a collision mesh got a primitive collider
    assert model.ngeom > 10
    # mass from URDF inertials preserved
    masses = np.asarray(model.body_mass)
    assert masses.max() > 4.0  # link1 is ~4.97 kg

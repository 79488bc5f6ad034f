"""Unit tests for the physics engine on analytic cases.

The reference has no physics unit layer (physics is trusted to PhysX,
SURVEY.md §4); a pure-JAX engine lets us test pendulum dynamics, free fall,
energy behavior, and contact resting directly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maniskill_tpu import physics as phys
from maniskill_tpu.physics import (
    BOX,
    DYNAMIC,
    FREE,
    HINGE,
    KINEMATIC,
    PLANE,
    SPHERE,
    STATIC,
    ModelBuilder,
    make_data,
)


def n_steps(model, data, n):
    """Run n physics steps as ONE jitted scan (single device dispatch)."""

    @jax.jit
    def run(d):
        d = phys.forward(model, d)  # prime contact pytree for the scan carry
        d, _ = jax.lax.scan(lambda d, _: (phys.step(model, d), None), d, None, length=n)
        return d

    return run(data)


def test_free_fall():
    mb = ModelBuilder(timestep=0.01)
    b = mb.add_body("ball", jnt_type=FREE, mass=1.0)
    mb.add_geom(b, SPHERE, [0.1], collision=False)
    model = mb.finalize()
    data = make_data(model, 4)
    data = data.replace(qpos=data.qpos.at[:, 2].set(10.0))
    t = 0.5
    data = n_steps(model, data, 50)
    # semi-implicit euler: z = z0 - g*h^2*(n(n+1)/2)
    expected = 10.0 - 9.81 * 0.01**2 * (50 * 51 / 2)
    np.testing.assert_allclose(data.qpos[:, 2], expected, rtol=1e-4)
    np.testing.assert_allclose(data.qvel[:, 2], -9.81 * t, rtol=1e-4)


def test_pendulum_period():
    """Point-mass pendulum, small oscillations: T = 2*pi*sqrt(L/g)."""
    L = 1.0
    mb = ModelBuilder(timestep=0.001)
    b = mb.add_body(
        "rod",
        jnt_type=HINGE,
        jnt_axis=(0, 1, 0),
        pos=(0, 0, 1.0),
        mass=1.0,
        ipos=(0, 0, -L),
        inertia=(1e-8, 1e-8, 1e-8),
    )
    model = mb.finalize()
    data = make_data(model, 1)
    theta0 = 0.05
    data = data.replace(qpos=data.qpos.at[:, 0].set(theta0))

    period = 2 * np.pi * np.sqrt(L / 9.81)
    data = n_steps(model, data, int(period / 0.001))
    # after one full period, angle should be back near theta0
    np.testing.assert_allclose(data.qpos[0, 0], theta0, atol=2e-3)


def test_pendulum_energy_conservation():
    L = 0.7
    mb = ModelBuilder(timestep=0.001)
    b = mb.add_body(
        "rod",
        jnt_type=HINGE,
        jnt_axis=(0, 1, 0),
        pos=(0, 0, 1.0),
        mass=2.0,
        ipos=(0, 0, -L),
        inertia=(1e-8, 1e-8, 1e-8),
    )
    model = mb.finalize()
    data = make_data(model, 1)
    data = data.replace(qpos=data.qpos.at[:, 0].set(1.0))

    def energy(d):
        d = phys.forward(model, d)
        theta = d.qpos[0, 0]
        omega = d.qvel[0, 0]
        h = 1.0 - L * jnp.cos(theta)
        return float(2.0 * 9.81 * h + 0.5 * 2.0 * (L * omega) ** 2)

    e0 = energy(data)
    data = n_steps(model, data, 1000)
    e1 = energy(data)
    assert abs(e1 - e0) / e0 < 0.02


def test_double_pendulum_energy_conservation():
    """Chaotic 2-link pendulum must conserve total energy (validates the
    coupled mass matrix + Coriolis terms together)."""
    mb = ModelBuilder(timestep=0.0005)
    l1 = mb.add_body(
        "l1", jnt_type=HINGE, jnt_axis=(0, 1, 0), pos=(0, 0, 2.0),
        mass=1.0, ipos=(0, 0, -0.5), inertia=(1e-8, 1e-8, 1e-8),
    )
    l2 = mb.add_body(
        "l2", parent=l1, jnt_type=HINGE, jnt_axis=(0, 1, 0), pos=(0, 0, -0.5),
        mass=1.0, ipos=(0, 0, -0.5), inertia=(1e-8, 1e-8, 1e-8),
    )
    model = mb.finalize()
    data = make_data(model, 1)
    data = data.replace(qpos=jnp.array([[1.2, 0.5]], jnp.float32))

    def energy(d):
        d = phys.forward(model, d)
        from maniskill_tpu.physics.kinematics import body_com
        from maniskill_tpu.physics.dynamics import mass_matrix_and_bias

        com = body_com(model, d)
        pe = float(9.81 * (1.0 * com[0, 1, 2] + 1.0 * com[0, 2, 2]))
        M, _ = mass_matrix_and_bias(model, d)
        ke = float(0.5 * d.qvel[0] @ M[0] @ d.qvel[0])
        return ke + pe

    e0 = energy(data)
    data = n_steps(model, data, 2000)  # 1 second
    e1 = energy(data)
    assert abs(e1 - e0) / max(abs(e0), 1e-6) < 0.02, (e0, e1)


def test_ball_rests_on_plane():
    mb = ModelBuilder(timestep=0.005)
    mb.add_geom(0, PLANE, [0, 0, 0], friction=1.0)
    b = mb.add_body("ball", jnt_type=FREE, mass=0.5)
    mb.add_geom(b, SPHERE, [0.1], friction=1.0)
    model = mb.finalize()
    data = make_data(model, 8)
    data = data.replace(qpos=data.qpos.at[:, 2].set(0.5))
    data = n_steps(model, data, 300)
    # ball should be resting at z ~= radius
    np.testing.assert_allclose(data.qpos[:, 2], 0.1, atol=0.01)
    assert np.all(np.abs(np.asarray(data.qvel[:, 2])) < 0.05)


def test_box_rests_on_plane():
    mb = ModelBuilder(timestep=0.005)
    mb.add_geom(0, PLANE, [0, 0, 0], friction=1.0)
    b = mb.add_body("box", jnt_type=FREE, mass=0.2)
    mb.add_geom(b, BOX, [0.02, 0.02, 0.02], friction=1.0)
    model = mb.finalize()
    data = make_data(model, 4)
    data = data.replace(qpos=data.qpos.at[:, 2].set(0.1))
    data = n_steps(model, data, 300)
    np.testing.assert_allclose(data.qpos[:, 2], 0.02, atol=0.005)
    # no drift in xy
    np.testing.assert_allclose(data.qpos[:, :2], 0.0, atol=0.01)


def test_friction_holds_box_on_incline():
    """Box on a 15-degree incline with mu=1.0 must not slide."""
    mb = ModelBuilder(timestep=0.005)
    ang = np.deg2rad(15)
    quat = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0])
    mb.add_geom(0, PLANE, [0, 0, 0], quat=quat, friction=1.0)
    b = mb.add_body("box", jnt_type=FREE, mass=0.2)
    mb.add_geom(b, BOX, [0.02, 0.02, 0.02], friction=1.0)
    model = mb.finalize()
    data = make_data(model, 1)
    # start resting on the incline at origin
    data = data.replace(
        qpos=data.qpos.at[:, :3].set(jnp.array([0.0, 0.0, 0.021]))
        .at[:, 3:7]
        .set(jnp.asarray(quat, jnp.float32))
    )
    data = n_steps(model, data, 200)
    np.testing.assert_allclose(np.asarray(data.qpos[0, :2]), 0.0, atol=0.02)


def test_frictionless_box_slides_on_incline():
    mb = ModelBuilder(timestep=0.005)
    ang = np.deg2rad(15)
    quat = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0])
    mb.add_geom(0, PLANE, [0, 0, 0], quat=quat, friction=0.0)
    b = mb.add_body("box", jnt_type=FREE, mass=0.2)
    mb.add_geom(b, BOX, [0.02, 0.02, 0.02], friction=0.0)
    model = mb.finalize()
    data = make_data(model, 1)
    data = data.replace(
        qpos=data.qpos.at[:, :3].set(jnp.array([0.0, 0.0, 0.021]))
        .at[:, 3:7]
        .set(jnp.asarray(quat, jnp.float32))
    )
    data = n_steps(model, data, 200)
    assert float(jnp.linalg.norm(data.qpos[0, :2])) > 0.05


def test_pd_drive_reaches_target():
    mb = ModelBuilder(timestep=0.01)
    b = mb.add_body(
        "arm", jnt_type=HINGE, jnt_axis=(0, 1, 0), pos=(0, 0, 1.0),
        mass=1.0, ipos=(0.3, 0, 0), inertia=(1e-4, 1e-4, 1e-4),
        limit=(-2.0, 2.0),
    )
    model = mb.finalize()
    model = model.replace(
        drive_kp=jnp.array([50.0]),
        drive_kd=jnp.array([10.0]),
        drive_force_limit=jnp.array([100.0]),
    )
    data = make_data(model, 2)
    data = data.replace(drive_target=jnp.full((2, 1), 0.7))
    data = n_steps(model, data, 400)
    np.testing.assert_allclose(data.qpos[:, 0], 0.7, atol=0.06)


def test_kinematic_body_immovable():
    mb = ModelBuilder(timestep=0.01)
    k = mb.add_body("kin", jnt_type=FREE, body_type=KINEMATIC, mass=1.0)
    mb.add_geom(k, BOX, [0.1, 0.1, 0.1])
    b = mb.add_body("ball", jnt_type=FREE, mass=1.0)
    mb.add_geom(b, SPHERE, [0.05])
    model = mb.finalize()
    data = make_data(model, 1)
    # ball above kinematic box
    data = data.replace(qpos=data.qpos.at[:, 9].set(0.5))
    data = n_steps(model, data, 100)
    # kinematic box did not move
    np.testing.assert_allclose(data.qpos[0, :3], 0.0, atol=1e-6)
    # ball rests on top of box (0.1 + 0.05)
    np.testing.assert_allclose(data.qpos[0, 9], 0.15, atol=0.01)


def test_joint_limits_respected():
    mb = ModelBuilder(timestep=0.01)
    b = mb.add_body(
        "arm", jnt_type=HINGE, jnt_axis=(0, 1, 0), pos=(0, 0, 1.0),
        mass=1.0, ipos=(0.3, 0, 0), inertia=(1e-4, 1e-4, 1e-4),
        limit=(-0.5, 0.5),
    )
    model = mb.finalize()
    data = make_data(model, 1)
    # gravity pulls the arm down (towards +- pi/2); limit must stop it
    data = n_steps(model, data, 300)
    assert abs(float(data.qpos[0, 0])) < 0.55


def test_stack_of_boxes_stable():
    mb = ModelBuilder(timestep=0.005)
    mb.add_geom(0, PLANE, [0, 0, 0], friction=1.0)
    b1 = mb.add_body("b1", jnt_type=FREE, mass=0.2)
    mb.add_geom(b1, BOX, [0.02, 0.02, 0.02], friction=1.0)
    b2 = mb.add_body("b2", jnt_type=FREE, mass=0.2)
    mb.add_geom(b2, BOX, [0.02, 0.02, 0.02], friction=1.0)
    model = mb.finalize()
    data = make_data(model, 1)
    data = data.replace(
        qpos=data.qpos.at[:, 2].set(0.02).at[:, 9].set(0.0601)
    )
    data = n_steps(model, data, 400)
    np.testing.assert_allclose(float(data.qpos[0, 2]), 0.02, atol=0.005)
    np.testing.assert_allclose(float(data.qpos[0, 9]), 0.06, atol=0.01)
    # top box still aligned over bottom box
    np.testing.assert_allclose(np.asarray(data.qpos[0, 7:9]), 0.0, atol=0.01)


def test_passive_joint_spring():
    """dof_stiffness pulls a hinge toward springref (MJCF joint stiffness)."""
    import maniskill_tpu.physics as phys
    from maniskill_tpu.physics.builder import ModelBuilder

    mb = ModelBuilder(timestep=0.01)
    mb.gravity = np.zeros(3)
    b = mb.add_body("arm", jnt_type=HINGE, jnt_axis=(0, 1, 0),
                    mass=1.0, inertia=np.array([0.1, 0.1, 0.1]),
                    damping=0.5, stiffness=10.0, springref=0.0)
    model = mb.finalize()
    data = make_data(model, 1)
    data = data.replace(qpos=jnp.full((1, 1), 1.0))
    data = phys.forward(model, data)

    def body(d, _):
        d = phys.step(model, d)
        return d, d.qpos[0, 0]

    data, qs = jax.lax.scan(body, data, None, length=400)
    # damped spring: settles near springref
    assert abs(float(qs[-1])) < 0.05, float(qs[-1])


def test_crb_matches_dense_jacobian_form():
    """Moment-based CRB mass matrix/bias == dense COM-jacobian contraction."""
    import numpy as np
    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.physics.dynamics import (
        mass_matrix_and_bias,
        mass_matrix_and_bias_dense,
    )
    from maniskill_tpu.physics.kinematics import forward_kinematics

    env = make("MS-HopperHop-v1", num_envs=3, obs_mode="state")
    env.reset(seed=0)
    base = env.unwrapped
    model, data = base.scene.model, base.scene.data
    rng = np.random.RandomState(0)
    qpos = np.asarray(data.qpos) + rng.randn(*data.qpos.shape).astype(np.float32) * 0.1
    qvel = rng.randn(*data.qvel.shape).astype(np.float32) * 0.3
    d = data.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
    d = forward_kinematics(model, d)
    M1, b1 = jax.jit(lambda d: mass_matrix_and_bias(model, d))(d)
    M2, b2 = jax.jit(lambda d: mass_matrix_and_bias_dense(model, d))(d)
    M1, b1, M2, b2 = map(np.asarray, (M1, b1, M2, b2))
    assert np.abs(M1 - M2).max() / np.abs(M2).max() < 2e-5
    assert np.abs(b1 - b2).max() / max(np.abs(b2).max(), 1e-9) < 2e-4


def test_body_drive_pulls_to_target():
    """World-anchored 6-dof drive (structs/drive.py) drags a cube to a
    target pose and holds it against gravity."""
    from maniskill_tpu.envs.scene import ManiSkillScene

    scene = ManiSkillScene(num_envs=2)
    b = scene.create_actor_builder()
    b.add_plane_collision()
    b.build_static(name="ground")
    bb = scene.create_actor_builder()
    bb.add_box_collision(half_size=[0.02] * 3)
    bb.set_initial_pose([0, 0, 0.02, 1, 0, 0, 0])
    cube = bb.build(name="cube")
    drive = scene.create_drive(
        None, None, cube, None,
        stiffness=(200.0, 5.0), damping=(20.0, 0.5), force_limit=(50.0, 5.0),
    )
    model = scene.finalize()
    qpos0 = phys.default_qpos(model)
    adr = int(np.asarray(model.body_q_adr)[cube.body_id])
    qpos0[adr : adr + 7] = [0, 0, 0.02, 1, 0, 0, 0]
    data = phys.make_data(model, 2)
    data = data.replace(qpos=jnp.broadcast_to(jnp.asarray(qpos0), data.qpos.shape))
    scene.bind(data)
    drive.set_drive_target(jnp.asarray([0.2, 0.1, 0.3, 1, 0, 0, 0]))
    d = n_steps(model, scene.data, 300)
    np.testing.assert_allclose(
        np.asarray(d.qpos[:, adr : adr + 2]), [[0.2, 0.1]] * 2, atol=0.01
    )
    assert abs(float(d.qpos[0, adr + 2]) - 0.3) < 0.02  # small gravity sag
    assert float(jnp.linalg.norm(d.qvel)) < 0.01


def test_two_finger_squeeze_lift():
    """The grasping acid test (SURVEY §7.3 #1): a 3-dof toy gripper
    (vertical carriage + two prismatic fingers) squeezes a cube and lifts
    it; the cube must track the carriage without slipping."""
    mb = ModelBuilder(timestep=0.005)
    mb.add_geom(0, PLANE, [0, 0, 0], friction=1.0)
    carriage = mb.add_body(
        "carriage", jnt_type=2, jnt_axis=(0, 0, 1), pos=(0, 0, 0.08),
        mass=0.5, inertia=(1e-3, 1e-3, 1e-3), limit=(-0.05, 0.5),
    )
    f1 = mb.add_body(
        "f1", parent=carriage, jnt_type=2, jnt_axis=(0, 1, 0),
        pos=(0, 0, 0), mass=0.1, inertia=(1e-4, 1e-4, 1e-4),
        limit=(0.0, 0.05),
    )
    f2 = mb.add_body(
        "f2", parent=carriage, jnt_type=2, jnt_axis=(0, -1, 0),
        pos=(0, 0, 0), mass=0.1, inertia=(1e-4, 1e-4, 1e-4),
        limit=(0.0, 0.05),
    )
    # finger pads: thin boxes facing each other across y, start 5cm apart
    mb.add_geom(f1, BOX, [0.02, 0.005, 0.03], pos=(0, -0.05, 0), friction=2.0)
    mb.add_geom(f2, BOX, [0.02, 0.005, 0.03], pos=(0, 0.05, 0), friction=2.0)
    cube = mb.add_body("cube", jnt_type=FREE, mass=0.064)
    mb.add_geom(cube, BOX, [0.02, 0.02, 0.02], friction=1.0)
    model = mb.finalize()
    model = model.replace(
        drive_kp=jnp.array([200.0, 300.0, 300.0] + [0.0] * 6),
        drive_kd=jnp.array([40.0, 30.0, 30.0] + [0.0] * 6),
        drive_force_limit=jnp.array([100.0, 30.0, 30.0] + [0.0] * 6),
    )
    data = make_data(model, 2)
    # cube between the fingers at carriage height
    data = data.replace(
        qpos=data.qpos.at[:, 3:6].set(jnp.asarray([0.0, 0.0, 0.08]))
    )
    # squeeze: finger targets closed (0.045 m each -> pads press the cube)
    data = data.replace(
        drive_target=data.drive_target.at[:, 1:3].set(0.045)
    )
    data = n_steps(model, data, 100)
    cube_z0 = float(data.qpos[0, 5])
    # lift: carriage up 0.2 m
    data = data.replace(drive_target=data.drive_target.at[:, 0].set(0.2))
    data = n_steps(model, data, 300)
    carriage_z = float(data.qpos[0, 0])
    cube_z = float(data.qpos[0, 5])
    assert carriage_z > 0.15, carriage_z
    # the cube must ride with the carriage (no slip through the squeeze)
    assert cube_z - cube_z0 > 0.8 * (carriage_z - 0.0), (cube_z0, cube_z, carriage_z)


def test_friction_cone_accuracy():
    """Slip threshold matches the analytic friction cone: a box with mu=0.3
    holds on a 15-degree incline (tan 15 = 0.27 < 0.3) and slides on a
    25-degree incline (tan 25 = 0.47 > 0.3)."""
    for deg, should_hold in [(15, True), (25, False)]:
        mb = ModelBuilder(timestep=0.005)
        ang = np.deg2rad(deg)
        quat = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0])
        mb.add_geom(0, PLANE, [0, 0, 0], quat=quat, friction=0.3)
        b = mb.add_body("box", jnt_type=FREE, mass=0.2)
        mb.add_geom(b, BOX, [0.02, 0.02, 0.02], friction=0.3)
        model = mb.finalize()
        data = make_data(model, 1)
        data = data.replace(
            qpos=data.qpos.at[:, :3].set(jnp.array([0.0, 0.0, 0.021]))
            .at[:, 3:7].set(jnp.asarray(quat, jnp.float32))
        )
        data = n_steps(model, data, 200)
        slid = float(jnp.linalg.norm(data.qpos[0, :2])) > 0.03
        assert slid != should_hold, (deg, float(jnp.linalg.norm(data.qpos[0, :2])))


def test_two_finger_squeeze_lift_heavy():
    """Heavier object (0.5 kg vs 30 N finger force limit): the squeeze must
    still transport it without slip — the VERDICT 'grasp-and-lift of a
    heavy object' fidelity check."""
    mb = ModelBuilder(timestep=0.005)
    mb.add_geom(0, PLANE, [0, 0, 0], friction=1.0)
    carriage = mb.add_body(
        "carriage", jnt_type=2, jnt_axis=(0, 0, 1), pos=(0, 0, 0.08),
        mass=0.5, inertia=(1e-3, 1e-3, 1e-3), limit=(-0.05, 0.5),
    )
    f1 = mb.add_body(
        "f1", parent=carriage, jnt_type=2, jnt_axis=(0, 1, 0), pos=(0, 0, 0),
        mass=0.1, inertia=(1e-4, 1e-4, 1e-4), limit=(0.0, 0.05),
    )
    f2 = mb.add_body(
        "f2", parent=carriage, jnt_type=2, jnt_axis=(0, -1, 0), pos=(0, 0, 0),
        mass=0.1, inertia=(1e-4, 1e-4, 1e-4), limit=(0.0, 0.05),
    )
    mb.add_geom(f1, BOX, [0.02, 0.005, 0.03], pos=(0, -0.05, 0), friction=2.0)
    mb.add_geom(f2, BOX, [0.02, 0.005, 0.03], pos=(0, 0.05, 0), friction=2.0)
    cube = mb.add_body("cube", jnt_type=FREE, mass=0.5)
    mb.add_geom(cube, BOX, [0.02, 0.02, 0.02], friction=1.5)
    model = mb.finalize()
    model = model.replace(
        drive_kp=jnp.array([400.0, 600.0, 600.0] + [0.0] * 6),
        drive_kd=jnp.array([80.0, 60.0, 60.0] + [0.0] * 6),
        drive_force_limit=jnp.array([200.0, 30.0, 30.0] + [0.0] * 6),
    )
    data = make_data(model, 2)
    data = data.replace(
        qpos=data.qpos.at[:, 3:6].set(jnp.asarray([0.0, 0.0, 0.08]))
    )
    data = data.replace(drive_target=data.drive_target.at[:, 1:3].set(0.045))
    data = n_steps(model, data, 100)
    cube_z0 = float(data.qpos[0, 5])
    data = data.replace(drive_target=data.drive_target.at[:, 0].set(0.2))
    data = n_steps(model, data, 300)
    carriage_z = float(data.qpos[0, 0])
    cube_z = float(data.qpos[0, 5])
    assert carriage_z > 0.12, carriage_z
    assert cube_z - cube_z0 > 0.7 * carriage_z, (cube_z0, cube_z, carriage_z)


def test_restitution_bounce():
    """Ball dropped on a plane with restitution e rebounds at ~e * impact
    speed (DefaultMaterialsConfig.restitution plumbed into the solver's
    normal-row targets); e=0 stays dead."""
    for e, min_ratio, max_ratio in ((0.8, 0.55, 0.95), (0.0, -0.05, 0.12)):
        mb = ModelBuilder(timestep=0.002)
        g = mb.add_body("ground", jnt_type=3, body_type=STATIC)  # FIXED
        mb.add_geom(g, PLANE, [0, 0, 0], restitution=e)
        b = mb.add_body("ball", jnt_type=FREE, mass=1.0)
        mb.add_geom(b, SPHERE, [0.05], restitution=e)
        model = mb.finalize().replace(bounce_threshold=0.2)
        data = make_data(model, 2)
        data = data.replace(
            qpos=data.qpos.at[:, 2].set(0.55),
            qvel=data.qvel.at[:, 2].set(-2.0),
        )

        @jax.jit
        def run(d):
            d = phys.forward(model, d)

            def body(d, _):
                d = phys.step(model, d)
                return d, d.qvel[:, 2]

            return jax.lax.scan(body, d, None, length=400)

        _, vz = run(data)
        impact = float(jnp.min(vz[:, 0]))  # fastest downward speed
        rebound = float(jnp.max(vz[:, 0]))  # fastest upward speed after
        ratio = rebound / -impact
        assert min_ratio <= ratio <= max_ratio, (
            f"e={e}: impact {impact:.3f}, rebound {rebound:.3f}, ratio {ratio:.3f}"
        )

"""Heterogeneous per-env simulation (the reference's Actor.merge capability,
natively: parameter tables broadcast over the env axis)."""
import numpy as np
import jax
import jax.numpy as jnp

from maniskill_tpu import physics as phys
from maniskill_tpu.physics import ModelBuilder, make_data
from maniskill_tpu.physics.types import BOX, FREE, PLANE, SPHERE


def test_per_env_geom_sizes():
    """Different cube sizes per env must rest at different heights."""
    mb = ModelBuilder(timestep=0.005)
    mb.add_geom(0, PLANE, [0, 0, 0], friction=1.0)
    b = mb.add_body("box", jnt_type=FREE, mass=0.2)
    mb.add_geom(b, BOX, [0.02, 0.02, 0.02], friction=1.0)
    model = mb.finalize()

    B = 4
    halfs = np.array([0.01, 0.02, 0.04, 0.08], np.float32)
    sizes = np.tile(halfs[:, None, None], (1, 1, 3))  # (B, 1, 3)
    gs = jnp.broadcast_to(model.geom_size, (B,) + model.geom_size.shape)
    model = model.replace(geom_size=gs.at[:, 1:2].set(jnp.asarray(sizes)))

    data = make_data(model, B)
    data = data.replace(qpos=data.qpos.at[:, 2].set(0.2))

    @jax.jit
    def run(d):
        d = phys.forward(model, d)
        d, _ = jax.lax.scan(lambda d, _: (phys.step(model, d), None), d, None, length=300)
        return d

    data = run(data)
    z = np.asarray(data.qpos[:, 2])
    np.testing.assert_allclose(z, halfs, atol=0.01)


def test_per_env_friction():
    """mu=0 envs slide on an incline; mu=1 envs hold."""
    ang = np.deg2rad(15)
    quat = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0])
    mb = ModelBuilder(timestep=0.005)
    mb.add_geom(0, PLANE, [0, 0, 0], quat=quat, friction=1.0)
    b = mb.add_body("box", jnt_type=FREE, mass=0.2)
    mb.add_geom(b, BOX, [0.02, 0.02, 0.02], friction=1.0)
    model = mb.finalize()

    B = 2
    gf = jnp.broadcast_to(model.geom_friction, (B,) + model.geom_friction.shape)
    gf = gf.at[0, :].set(0.0)  # env 0 frictionless (both geoms)
    model = model.replace(geom_friction=gf)

    data = make_data(model, B)
    data = data.replace(
        qpos=data.qpos.at[:, :3].set(jnp.array([0.0, 0.0, 0.021]))
        .at[:, 3:7].set(jnp.asarray(quat, jnp.float32))
    )

    @jax.jit
    def run(d):
        d = phys.forward(model, d)
        d, _ = jax.lax.scan(lambda d, _: (phys.step(model, d), None), d, None, length=200)
        return d

    data = run(data)
    slide0 = float(jnp.linalg.norm(data.qpos[0, :2]))
    slide1 = float(jnp.linalg.norm(data.qpos[1, :2]))
    assert slide0 > 0.05, slide0
    assert slide1 < 0.02, slide1


def test_per_env_mass_gravity_force():
    """Contact force on the plane must scale with per-env mass."""
    mb = ModelBuilder(timestep=0.005)
    mb.add_geom(0, PLANE, [0, 0, 0], friction=1.0)
    b = mb.add_body("ball", jnt_type=FREE, mass=1.0)
    mb.add_geom(b, SPHERE, [0.05], friction=1.0)
    model = mb.finalize()

    B = 3
    masses = jnp.asarray([0.5, 1.0, 2.0])
    bm = jnp.broadcast_to(model.body_mass, (B,) + model.body_mass.shape)
    model = model.replace(body_mass=bm.at[:, b].set(masses))

    data = make_data(model, B)
    data = data.replace(qpos=data.qpos.at[:, 2].set(0.0501))

    @jax.jit
    def run(d):
        d = phys.forward(model, d)
        d, _ = jax.lax.scan(lambda d, _: (phys.step(model, d), None), d, None, length=100)
        return d

    data = run(data)
    fz = np.asarray(jnp.sum(data.contact.impulse[..., 2], axis=1)) / model.timestep
    np.testing.assert_allclose(fz, np.asarray(masses) * 9.81, rtol=0.05)


def test_heterogeneous_cabinet_articulations():
    """OpenCabinetDrawer-v1: per-env cabinet VARIANTS (different drawer/door
    counts — the reference's PartNet-Mobility sampling + Articulation.merge,
    open_cabinet_drawer.py:128-176) realized as parameter tables over a
    union template. Locked slots must be immovable; active target drawers
    must open; handle positions must differ across envs."""
    import maniskill_tpu.envs  # noqa: F401  (registers envs + robots)
    from maniskill_tpu.building.articulations.cabinet import NUM_SLOTS
    from maniskill_tpu.utils.registration import make

    env = make("OpenCabinetDrawer-v1", num_envs=8, obs_mode="state")
    base = env.unwrapped
    env.reset(seed=0)

    inst = base.cab_inst
    # the batch genuinely mixes structures
    assert len(np.unique(inst.variant_ids)) >= 2
    assert not np.all(inst.active == inst.active[0])

    # handle world positions differ across envs with different variants
    hp = np.asarray(base.handle_pos)
    assert np.ptp(hp, axis=0).max() > 0.01

    # open every slot to 90% of ITS OWN per-env limit; locked slots (range
    # [0,0]) get a 0.05 violation instead. The limit solver must push locked
    # slots back to 0 while active slots hold their in-range opening.
    target_q = np.maximum(0.9 * inst.limits[..., 1], 0.05).astype(np.float32)
    q = base.scene.data.qpos
    q = q.at[:, base.cab_meta.slot_qadrs].set(jnp.asarray(target_q))
    base.scene.bind(base.scene.data.replace(qpos=q))
    for _ in range(20):
        env.step(jnp.zeros((8,) + base.single_action_space.shape))
    qs = np.asarray(base.scene.data.qpos[:, base.cab_meta.slot_qadrs])
    active = inst.active
    # locked slots pushed back into their [0, 0] range
    assert np.abs(qs[~active]).max() < 5e-3, qs[~active]
    # active slots retain most of their opening (within their real limits)
    assert (qs[active] > 0.8 * target_q[active]).all(), qs[active]

    # evaluate() sees the opened target as open
    info = jax.jit(base.evaluate)()
    frac = np.asarray(info["open_frac"])
    assert frac.min() > 0.6, frac

"""Sharding-correctness tests (run with the 8-virtual-device CPU mesh:
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8).

The env axis shards over the mesh; the same seed must produce bit-identical
trajectories whether the batch lives on one device or is sharded over
eight (SURVEY §5: data-parallel env sharding is the multi-chip story).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make

pytestmark = pytest.mark.multidevice


def _rollout(env, seed, steps, shard=False):
    base = env.unwrapped
    obs, _ = env.reset(seed=seed)
    if shard:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.array(jax.devices()), ("env",))
        sharding = NamedSharding(mesh, P("env"))
        data = jax.tree.map(
            lambda x: jax.device_put(x, sharding)
            if hasattr(x, "ndim") and x.ndim and x.shape[0] == base.num_envs
            else x,
            base.scene.data,
        )
        base.scene.bind(data)
    outs = []
    rng = np.random.RandomState(0)
    for _ in range(steps):
        act = jnp.asarray(
            rng.uniform(-1, 1, (base.num_envs,) + base.single_action_space.shape),
            jnp.float32,
        )
        obs, rew, term, trunc, info = env.step(act)
        outs.append(np.asarray(obs))
    return np.stack(outs)


def test_sharded_rollout_matches_single_device():
    n = len(jax.devices())
    env = make("PushCube-v1", num_envs=n * 2, obs_mode="state")
    ref = _rollout(env, seed=3, steps=5, shard=False)
    env.reset(seed=3)
    got = _rollout(env, seed=3, steps=5, shard=True)
    np.testing.assert_allclose(ref, got, atol=1e-5)
    env.close()


def test_sharded_contact_rich_rollout():
    """Contact solver + hull narrowphase execute under env-axis sharding
    and match the single-device trajectory (VERDICT r3 #7)."""
    n = len(jax.devices())
    env = make("PickCube-v1", num_envs=n * 2, obs_mode="state")
    ref = _rollout(env, seed=7, steps=3, shard=False)
    env.reset(seed=7)
    got = _rollout(env, seed=7, steps=3, shard=True)
    np.testing.assert_allclose(ref, got, atol=1e-5)
    env.close()


def test_sharded_rgb_rollout():
    """The rasterized rgb obs pipeline executes under env-axis sharding."""
    n = len(jax.devices())
    env = make("PushCube-v1", num_envs=n * 2, obs_mode="rgb")
    base = env.unwrapped
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    env.reset(seed=1)
    mesh = Mesh(np.array(jax.devices()), ("env",))
    sharding = NamedSharding(mesh, P("env"))
    data = jax.tree.map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "ndim") and x.ndim and x.shape[0] == base.num_envs
        else x,
        base.scene.data,
    )
    base.scene.bind(data)
    act = jnp.zeros((base.num_envs,) + base.single_action_space.shape, jnp.float32)
    obs, rew, term, trunc, info = env.step(act)
    rgb = obs["sensor_data"]["base_camera"]["rgb"] if isinstance(obs, dict) else obs
    assert np.asarray(jax.tree.leaves(rgb)[0]).shape[0] == base.num_envs
    env.close()


def test_sharded_ppo_step_runs():
    """The full fused PPO train step jits and executes over the mesh
    (the dryrun_multichip path, kept under test)."""
    from jax.sharding import Mesh

    from maniskill_tpu.parallel.train import make_sharded_ppo_step

    mesh = Mesh(np.array(jax.devices()), ("env",))
    run_once, env = make_sharded_ppo_step(mesh, num_envs=len(jax.devices()) * 2)
    metrics = run_once()
    assert np.isfinite(float(metrics["loss"]))
    env.close()

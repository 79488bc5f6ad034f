"""RFCL: reverse-curriculum SAC — h5 demo loading, curriculum-state resets
inside the fused train step, and pointer advancement."""
import numpy as np
import jax
import jax.numpy as jnp

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make
from maniskill_tpu.wrappers.record import RecordEpisode
from maniskill_tpu.parallel.sac import SACConfig
from maniskill_tpu.parallel.rfcl import (
    RFCLConfig, load_demo_states, make_rfcl_step,
)


def _record_demo(tmp_path, n_steps=6):
    env = make("PushCube-v1", num_envs=1, obs_mode="state")
    rec = RecordEpisode(env, str(tmp_path), save_video=False, trajectory_name="d")
    rec.reset(seed=5)
    rng = np.random.RandomState(1)
    for _ in range(n_steps):
        rec.step(rng.uniform(-1, 1, env.unwrapped.single_action_space.shape)
                 .astype(np.float32))
    rec.close()
    return str(tmp_path / "d.h5")


def test_rfcl_loader_and_step(tmp_path):
    h5 = _record_demo(tmp_path)
    demo_states, demo_lens, demos = load_demo_states(h5)
    assert int(demo_lens[0]) == 7  # T+1 snapshots
    assert demos is not None and demos["obs"].shape[0] == 6
    cube = demo_states["actors"]["cube"]
    assert cube.shape[0] == 1 and cube.shape[1] == 7

    env = make("PushCube-v1", num_envs=2, obs_mode="state")
    base = env.unwrapped
    obs, _ = env.reset(seed=0)
    cfg = RFCLConfig(
        sac=SACConfig(rollout_steps=2, buffer_steps=8, batch_size=16, utd=1),
        reverse_step_size=2,
        success_threshold=0.4,
    )
    actor, init_state, train_step = make_rfcl_step(
        env, demo_states, demo_lens, cfg, demos=demos
    )
    train_step = jax.jit(train_step)
    key = jax.random.PRNGKey(0)
    state = init_state(key, obs.shape[-1])
    data = base.scene.data
    elapsed = jnp.zeros((2,), jnp.int32)
    for it in range(4):
        state, data, obs, elapsed, key, metrics = train_step(
            state, data, obs, elapsed, key, jnp.asarray(it >= 2)
        )
    assert int(state.sac.filled) == 8
    assert np.isfinite(float(metrics["q_loss"]))
    assert np.isfinite(float(metrics["mean_k"]))
    # curriculum pointers stay within demo bounds
    assert (np.asarray(state.k) <= np.asarray(demo_lens) - 1).all()
    env.close()


def test_rfcl_curriculum_reset_restores_demo_state(tmp_path):
    """An env flagged done in the reverse phase must restart from its demo
    state (the cube lands exactly at the recorded demo pose)."""
    h5 = _record_demo(tmp_path)
    demo_states, demo_lens, _ = load_demo_states(h5)

    env = make("PushCube-v1", num_envs=2, obs_mode="state")
    base = env.unwrapped
    env.reset(seed=3)
    # reset both envs to demo state at k=1 (second-to-last) via the same
    # masked path the fused loop uses
    k = jnp.ones((1,), jnp.int32)
    d = jnp.zeros((2,), jnp.int32)
    idx = jnp.maximum(demo_lens[d] - 1 - k[d], 0)
    states = jax.tree_util.tree_map(lambda x: x[d, idx], demo_states)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    data, obs, _ = base._reset_impl(
        base.scene.data, jnp.asarray([True, False]), keys, states
    )
    base.scene.bind(data)
    got = np.asarray(base.scene.actors["cube"].pose.p)
    want = np.asarray(demo_states["actors"]["cube"])[0, int(idx[0]), :3]
    np.testing.assert_allclose(got[0], want, atol=1e-4)
    env.close()

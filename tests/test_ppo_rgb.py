"""Visual PPO: one fused rgb train step (render + CNN + update in one jit).

Counterpart coverage for examples/baselines/ppo/ppo_rgb.py: the rollout
renders rgb inside the jitted program and the NatureCNN policy consumes it.
"""
import jax
import jax.numpy as jnp
import numpy as np

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make
from maniskill_tpu.parallel.train import (
    PPOConfig,
    make_obs_transform,
    make_train_step,
)


def test_fused_rgb_train_step():
    env = make("PushCube-v1", num_envs=4, obs_mode="rgb")
    base = env.unwrapped
    raw_obs, _ = env.reset(seed=0)

    config = PPOConfig(rollout_steps=2, update_epochs=1, num_minibatches=1)
    model, init_state, train_step = make_train_step(env, config)
    obs_tf = make_obs_transform(base)
    obs = obs_tf(raw_obs)
    assert obs["rgb"].dtype == jnp.uint8 and obs["rgb"].shape[1:] == (128, 128, 3)
    assert obs["state"].ndim == 2

    key = jax.random.PRNGKey(0)
    params, opt_state, tx = init_state(key, obs)

    step = jax.jit(lambda p, o, d, ob, el, k: train_step(p, o, tx, d, ob, el, k))
    data = base.scene.data
    elapsed = jnp.zeros(4, jnp.int32)
    params, opt_state, data, obs2, elapsed, key, metrics = step(
        params, opt_state, data, obs, elapsed, key
    )
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["bad_params"]) == 0
    assert obs2["rgb"].shape == obs["rgb"].shape
    env.close()

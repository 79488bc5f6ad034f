"""TD-MPC2 trainer smoke test: fused plan+collect+update compiles and runs,
and the two-hot discrete-regression round-trip is exact on the bin grid."""
import jax
import jax.numpy as jnp
import numpy as np

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make
from maniskill_tpu.parallel.tdmpc2 import (
    TDMPC2Config, make_tdmpc2_step, two_hot, two_hot_inv, symlog, symexp,
)


def test_two_hot_roundtrip():
    cfg = TDMPC2Config()
    x = jnp.asarray([-5.0, -0.3, 0.0, 0.7, 42.0])
    enc = two_hot(x, cfg)
    assert enc.shape == (5, cfg.num_bins)
    np.testing.assert_allclose(np.sum(np.asarray(enc), -1), 1.0, atol=1e-5)
    # softmax(log p) = p, so log-encoding logits invert exactly (within the
    # symlog clipping range)
    logits = jnp.log(enc + 1e-9)
    dec = two_hot_inv(logits, cfg)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(x), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(symexp(symlog(x))), np.asarray(x), rtol=1e-5, atol=1e-6
    )


def test_tdmpc2_step_runs():
    env = make("MS-CartpoleBalance-v1", num_envs=2, obs_mode="state")
    base = env.unwrapped
    obs, _ = env.reset(seed=0)
    from maniskill_tpu.utils.gym_utils import find_max_episode_steps_value

    ep_len = find_max_episode_steps_value(env) or 50
    config = TDMPC2Config(
        horizon=2, num_samples=16, num_elites=4, num_pi_trajs=2,
        iterations=2, latent_dim=32, simnorm_dim=8, enc_dim=32, mlp_dim=32,
        num_q=2, batch_size=8, rollout_steps=2,
        buffer_steps=ep_len, num_updates=1,
    )
    init_state, train_step, act = make_tdmpc2_step(env, config)
    train_step = jax.jit(train_step)
    key = jax.random.PRNGKey(0)
    state = init_state(key, obs.shape[-1])
    data = base.scene.data
    elapsed = jnp.zeros((2,), jnp.int32)
    for it in range(3):
        state, data, obs, elapsed, key, metrics = train_step(
            state, data, obs, elapsed, key, jnp.asarray(it >= 2)
        )
    assert int(state.filled) == 6
    for k in ("consistency_loss", "reward_loss", "value_loss", "pi_loss"):
        assert np.isfinite(float(metrics[k])), k
    # planner produces in-range actions
    a, state = jax.jit(act, static_argnames=("eval_mode",))(
        state, obs, elapsed == 0, key, eval_mode=True
    )
    assert a.shape == (2, int(np.prod(base.single_action_space.shape)))
    assert np.all(np.abs(np.asarray(a)) <= 1.0 + 1e-6)
    env.close()

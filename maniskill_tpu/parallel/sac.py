"""Soft Actor-Critic, fully on-device (counterpart of the reference's
examples/baselines/sac/sac.py CleanRL-style trainer).

TPU-first design: the replay buffer is a device-resident ring on the step
axis ((buf_steps, num_envs, dim) jax arrays), and one `train_step` jit fuses
environment collection (lax.scan over the physics step), ring insertion
(dynamic_update_slice), uniform sampling, and `utd` gradient updates — so
steady-state training runs with zero host↔device traffic.
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .train import make_env_step_fns


class TanhGaussianActor(nn.Module):
    act_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.relu(nn.Dense(self.hidden)(x))
        mean = nn.Dense(self.act_dim)(x)
        log_std = nn.Dense(self.act_dim)(x)
        log_std = jnp.clip(log_std, -5.0, 2.0)
        return mean, log_std


class TwinQ(nn.Module):
    hidden: int = 256

    @nn.compact
    def __call__(self, obs, act):
        x = jnp.concatenate([obs, act], axis=-1)
        qs = []
        for _ in range(2):
            h = x
            for _ in range(2):
                h = nn.relu(nn.Dense(self.hidden)(h))
            qs.append(nn.Dense(1)(h)[..., 0])
        return qs[0], qs[1]


class SACConfig(NamedTuple):
    rollout_steps: int = 4  # env steps per train_step call
    buffer_steps: int = 512  # ring length (transitions = buffer_steps*num_envs)
    batch_size: int = 4096
    utd: int = 4  # gradient updates per train_step
    gamma: float = 0.9
    tau: float = 0.005
    lr: float = 3e-4
    alpha_lr: float = 3e-4
    ignore_terminations: bool = False


class SACState(NamedTuple):
    actor_params: dict
    q_params: dict
    q_target: dict
    log_alpha: jax.Array
    actor_opt: optax.OptState
    q_opt: optax.OptState
    alpha_opt: optax.OptState
    # ring buffer
    buf_obs: jax.Array
    buf_act: jax.Array
    buf_rew: jax.Array
    buf_next_obs: jax.Array
    buf_term: jax.Array
    ptr: jax.Array  # next write slot on the step axis
    filled: jax.Array  # number of valid steps in the ring


def _sample_action(actor, params, obs, key):
    mean, log_std = actor.apply(params, obs)
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape)
    pre = mean + std * eps
    act = jnp.tanh(pre)
    logp = -0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi))
    logp = logp - jnp.log(1.0 - act**2 + 1e-6)
    return act, jnp.sum(logp, axis=-1)


def make_sac_step(env, config: SACConfig = SACConfig(), demos=None):
    """demos: optional dict(obs, act, rew, next_obs, term) of jnp arrays —
    each update batch becomes a 50/50 mix of online replay and demo
    transitions (the RLPD recipe, reference examples/baselines/rlpd)."""
    base = env.unwrapped
    num_envs = base.num_envs
    act_dim = int(np.prod(base.single_action_space.shape))
    step_fn, reset_fn = make_env_step_fns(env)
    actor = TanhGaussianActor(act_dim)
    qnet = TwinQ()

    from ..utils.gym_utils import find_max_episode_steps_value

    max_steps = find_max_episode_steps_value(env) or 50
    assert config.buffer_steps % config.rollout_steps == 0

    target_entropy = -float(act_dim)
    actor_tx = optax.adam(config.lr)
    q_tx = optax.adam(config.lr)
    alpha_tx = optax.adam(config.alpha_lr)

    def init_state(key, obs_dim) -> SACState:
        k1, k2 = jax.random.split(key)
        zo = jnp.zeros((1, obs_dim))
        za = jnp.zeros((1, act_dim))
        actor_params = actor.init(k1, zo)
        q_params = qnet.init(k2, zo, za)
        S, B = config.buffer_steps, num_envs
        return SACState(
            actor_params=actor_params,
            q_params=q_params,
            q_target=jax.tree.map(lambda x: x, q_params),
            log_alpha=jnp.zeros(()),
            actor_opt=actor_tx.init(actor_params),
            q_opt=q_tx.init(q_params),
            alpha_opt=alpha_tx.init(jnp.zeros(())),
            buf_obs=jnp.zeros((S, B, obs_dim)),
            buf_act=jnp.zeros((S, B, act_dim)),
            buf_rew=jnp.zeros((S, B)),
            buf_next_obs=jnp.zeros((S, B, obs_dim)),
            buf_term=jnp.zeros((S, B), bool),
            ptr=jnp.zeros((), jnp.int32),
            filled=jnp.zeros((), jnp.int32),
        )

    def collect(state: SACState, data, obs, elapsed, key):
        def body(carry, _):
            data, obs, elapsed, key = carry
            key, akey, rkey = jax.random.split(key, 3)
            action, _ = _sample_action(actor, state.actor_params, obs, akey)
            new_data, next_obs, reward, terminated = step_fn(data, action)
            elapsed = elapsed + 1
            if config.ignore_terminations:
                terminated = jnp.zeros_like(terminated)
            truncated = (elapsed >= max_steps) & ~terminated
            done = terminated | truncated
            keys = jax.random.split(rkey, num_envs)
            reset_data, reset_obs = reset_fn(new_data, done, keys)
            elapsed = jnp.where(done, 0, elapsed)
            out = (obs, action, reward, next_obs, terminated)
            return (reset_data, reset_obs, elapsed, key), out

        (data, obs, elapsed, key), traj = jax.lax.scan(
            body, (data, obs, elapsed, key), None, length=config.rollout_steps
        )
        o, a, r, no, t = traj
        # ring insert (ptr is always a multiple of rollout_steps)
        state = state._replace(
            buf_obs=jax.lax.dynamic_update_slice_in_dim(state.buf_obs, o, state.ptr, 0),
            buf_act=jax.lax.dynamic_update_slice_in_dim(state.buf_act, a, state.ptr, 0),
            buf_rew=jax.lax.dynamic_update_slice_in_dim(state.buf_rew, r, state.ptr, 0),
            buf_next_obs=jax.lax.dynamic_update_slice_in_dim(
                state.buf_next_obs, no, state.ptr, 0
            ),
            buf_term=jax.lax.dynamic_update_slice_in_dim(
                state.buf_term, t, state.ptr, 0
            ),
            ptr=(state.ptr + config.rollout_steps) % config.buffer_steps,
            filled=jnp.minimum(
                state.filled + config.rollout_steps, config.buffer_steps
            ),
        )
        return state, data, obs, elapsed, key

    def q_loss(q_params, state: SACState, batch, key):
        obs, act, rew, next_obs, term = batch
        next_act, next_logp = _sample_action(actor, state.actor_params, next_obs, key)
        tq1, tq2 = qnet.apply(state.q_target, next_obs, next_act)
        alpha = jnp.exp(state.log_alpha)
        target = rew + config.gamma * (1.0 - term) * (
            jnp.minimum(tq1, tq2) - alpha * next_logp
        )
        q1, q2 = qnet.apply(q_params, obs, act)
        target = jax.lax.stop_gradient(target)
        return jnp.mean((q1 - target) ** 2 + (q2 - target) ** 2)

    def actor_loss(actor_params, state: SACState, obs, key):
        act, logp = _sample_action(actor, actor_params, obs, key)
        q1, q2 = qnet.apply(state.q_params, obs, act)
        alpha = jnp.exp(state.log_alpha)
        return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

    def alpha_loss(log_alpha, logp):
        return -jnp.mean(jnp.exp(log_alpha) * (jax.lax.stop_gradient(logp) + target_entropy))

    def update_once(state: SACState, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        n = state.filled * num_envs
        online_bs = config.batch_size // 2 if demos is not None else config.batch_size
        idx = jax.random.randint(k1, (online_bs,), 0, n)
        s, b = idx // num_envs, idx % num_envs
        batch = (
            state.buf_obs[s, b],
            state.buf_act[s, b],
            state.buf_rew[s, b],
            state.buf_next_obs[s, b],
            state.buf_term[s, b].astype(jnp.float32),
        )
        if demos is not None:
            dk, k1 = jax.random.split(k1)
            di = jax.random.randint(
                dk, (config.batch_size - online_bs,), 0, demos["obs"].shape[0]
            )
            batch = tuple(
                jnp.concatenate([x, d[di]], axis=0)
                for x, d in zip(
                    batch,
                    (
                        demos["obs"], demos["act"], demos["rew"],
                        demos["next_obs"], demos["term"].astype(jnp.float32),
                    ),
                )
            )
        ql, qg = jax.value_and_grad(q_loss)(state.q_params, state, batch, k2)
        qup, q_opt = q_tx.update(qg, state.q_opt)
        q_params = optax.apply_updates(state.q_params, qup)
        state = state._replace(q_params=q_params, q_opt=q_opt)

        (al, logp), ag = jax.value_and_grad(actor_loss, has_aux=True)(
            state.actor_params, state, batch[0], k3
        )
        aup, actor_opt = actor_tx.update(ag, state.actor_opt)
        actor_params = optax.apply_updates(state.actor_params, aup)

        ell, eg = jax.value_and_grad(alpha_loss)(state.log_alpha, logp)
        eup, alpha_opt = alpha_tx.update(eg, state.alpha_opt)
        log_alpha = optax.apply_updates(state.log_alpha, eup)

        q_target = jax.tree.map(
            lambda t, p: t * (1 - config.tau) + p * config.tau,
            state.q_target, q_params,
        )
        state = state._replace(
            actor_params=actor_params, actor_opt=actor_opt,
            log_alpha=log_alpha, alpha_opt=alpha_opt, q_target=q_target,
        )
        return state, (ql, al)

    def train_step(state: SACState, data, obs, elapsed, key, learn):
        """One collect + (if learn) utd updates. `learn` is a traced bool so
        warm-up (buffer fill) uses the same compiled program."""
        key, ckey, ukey = jax.random.split(key, 3)
        state, data, obs, elapsed, ckey = collect(state, data, obs, elapsed, ckey)

        def do_updates(state):
            def body(st, k):
                st, losses = update_once(st, k)
                return st, losses

            state, losses = jax.lax.scan(
                body, state, jax.random.split(ukey, config.utd)
            )
            return state, jax.tree.map(jnp.mean, losses)

        def skip(state):
            return state, (jnp.zeros(()), jnp.zeros(()))

        state, (ql, al) = jax.lax.cond(learn, do_updates, skip, state)
        metrics = dict(q_loss=ql, actor_loss=al, alpha=jnp.exp(state.log_alpha))
        return state, data, obs, elapsed, key, metrics

    return actor, qnet, init_state, train_step

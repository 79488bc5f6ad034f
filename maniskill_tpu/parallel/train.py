"""Sharded PPO training step (flagship multi-chip path).

The reference scales by batching envs on ONE GPU (SURVEY.md §2.2: no
multi-node story); the TPU-native win is sharding the env axis of the SAME
jitted program over a device mesh — rollout physics, policy forward/backward,
and the PPO update all run SPMD, with XLA inserting psums over ICI for the
gradient reduction. This module builds that program; it is also the
examples/baselines/ppo counterpart.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import flax.linen as nn
import optax


class ActorCritic(nn.Module):
    action_dim: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        def mlp(x):
            for _ in range(2):
                x = nn.tanh(nn.Dense(self.hidden)(x))
            return x

        pi = mlp(x)
        mean = nn.Dense(self.action_dim, kernel_init=nn.initializers.orthogonal(0.01))(pi)
        log_std = self.param("log_std", nn.initializers.constant(-0.5), (self.action_dim,))
        log_std = jnp.clip(log_std, -4.0, 1.0)  # guard against std collapse/blowup
        v = nn.Dense(1)(mlp(x))[..., 0]
        return mean, log_std, v


class NatureCNN(nn.Module):
    """NatureCNN visual extractor (reference ppo_rgb.py:176-233).

    Convs run in bfloat16 — the encoder is the MXU-heavy part of visual PPO
    and bf16 doubles its throughput; features are cast back to f32 for the
    policy/value heads.
    """

    feature_size: int = 256

    @nn.compact
    def __call__(self, obs: dict) -> jax.Array:
        feats = []
        for key in ("rgb", "rgbd"):
            if key in obs:
                x = obs[key].astype(jnp.bfloat16) / 255.0
                for ch, k, s in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
                    x = nn.relu(
                        nn.Conv(
                            ch, (k, k), strides=(s, s), padding="VALID",
                            dtype=jnp.bfloat16, name=f"{key}_conv{k}",
                        )(x)
                    )
                x = x.reshape(x.shape[0], -1)
                x = nn.relu(
                    nn.Dense(
                        self.feature_size, dtype=jnp.bfloat16, name=f"{key}_fc"
                    )(x)
                )
                feats.append(x.astype(jnp.float32))
        if "depth" in obs:
            # separate depth tower (int16 mm -> meters), same architecture
            x = obs["depth"].astype(jnp.bfloat16) / 1000.0
            for ch, k, s in ((32, 8, 4), (64, 4, 2), (64, 3, 1)):
                x = nn.relu(
                    nn.Conv(
                        ch, (k, k), strides=(s, s), padding="VALID",
                        dtype=jnp.bfloat16, name=f"depth_conv{k}",
                    )(x)
                )
            x = x.reshape(x.shape[0], -1)
            x = nn.relu(
                nn.Dense(self.feature_size, dtype=jnp.bfloat16, name="depth_fc")(x)
            )
            feats.append(x.astype(jnp.float32))
        if "state" in obs:
            feats.append(nn.Dense(256, name="state_fc")(obs["state"]))
        return jnp.concatenate(feats, axis=-1)


class VisualActorCritic(nn.Module):
    """Shared NatureCNN encoder + separate actor/critic heads
    (reference ppo_rgb.py:235-274)."""

    action_dim: int
    hidden: int = 512

    @nn.compact
    def __call__(self, obs: dict):
        x = NatureCNN(name="feature_net")(obs)
        pi = nn.relu(nn.Dense(self.hidden, name="actor_fc")(x))
        mean = nn.Dense(
            self.action_dim,
            kernel_init=nn.initializers.orthogonal(0.01 * np.sqrt(2)),
            name="actor_out",
        )(pi)
        log_std = self.param(
            "log_std", nn.initializers.constant(-0.5), (self.action_dim,)
        )
        log_std = jnp.clip(log_std, -4.0, 1.0)
        vf = nn.relu(nn.Dense(self.hidden, name="critic_fc")(x))
        v = nn.Dense(1, name="critic_out")(vf)[..., 0]
        return mean, log_std, v


class PPOConfig(NamedTuple):
    rollout_steps: int = 16
    gamma: float = 0.8
    gae_lambda: float = 0.9
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    lr: float = 3e-4
    update_epochs: int = 4
    num_minibatches: int = 4
    max_grad_norm: float = 0.5
    # infinite-horizon mode (reference ManiSkillVectorEnv ignore_terminations):
    # success does not end the episode, removing the hover-at-the-boundary
    # reward hack that early termination induces under discounting
    ignore_terminations: bool = False


def make_env_step_fns(env):
    """Pure (data, action) -> ... and reset fns extracted from a BaseEnv."""
    base = env.unwrapped

    def step_fn(data, action):
        new_data, obs, reward, terminated, info = base._step_impl(data, action)
        return new_data, obs, reward, terminated

    def reset_fn(data, mask, keys):
        new_data, obs, info = base._reset_impl(data, mask, keys, None)
        return new_data, obs

    return step_fn, reset_fn


def make_obs_transform(base):
    """Pure fn mapping a raw visual obs dict -> {rgb/depth: (B,H,W,C), state}
    (FlattenRGBDObservationWrapper semantics, usable inside the rollout jit)."""
    from ..utils import common

    def obs_tf(obs):
        out = {}
        rgbs, depths = [], []
        for cam in sorted(obs.get("sensor_data", {})):
            data = obs["sensor_data"][cam]
            if "rgb" in data:
                rgbs.append(data["rgb"])
            if "depth" in data:
                depths.append(data["depth"])
        if rgbs:
            out["rgb"] = jnp.concatenate(rgbs, axis=-1)
        if depths:
            out["depth"] = jnp.concatenate(depths, axis=-1)
        out["state"] = common.flatten_state_dict(
            dict(agent=obs.get("agent", {}), extra=obs.get("extra", {}))
        )
        return out

    return obs_tf


def make_train_step(env, config: PPOConfig = PPOConfig()):
    """Build (init_state, train_step) for PPO on a batched env.

    Supports state obs (flat vector + MLP ActorCritic) and visual obs
    (obs_mode="rgb"/"rgbd"/...: render fused into the rollout jit, dict obs
    through a NatureCNN VisualActorCritic — reference ppo_rgb.py:1-594)."""
    base = env.unwrapped
    num_envs = base.num_envs
    act_dim = int(np.prod(base.single_action_space.shape))
    raw_step_fn, raw_reset_fn = make_env_step_fns(env)

    visual = base.obs_mode not in ("state", "none")
    if visual:
        obs_tf = make_obs_transform(base)
        model = VisualActorCritic(act_dim)

        def step_fn(data, action):
            d, obs, rew, term = raw_step_fn(data, action)
            return d, obs_tf(obs), rew, term

        def reset_fn(data, mask, keys):
            d, obs = raw_reset_fn(data, mask, keys)
            return d, obs_tf(obs)

    else:
        obs_tf = lambda o: o
        model = ActorCritic(act_dim)
        step_fn, reset_fn = raw_step_fn, raw_reset_fn

    from ..utils.gym_utils import find_max_episode_steps_value

    max_steps = find_max_episode_steps_value(env) or 50

    def init_state(key, obs_dim, total_updates=None):
        if isinstance(obs_dim, int):
            sample = jnp.zeros((1, obs_dim))
        else:
            # a sample obs (raw env obs or already-transformed dict)
            sample = obs_dim
            if visual and "sensor_data" in sample:
                sample = obs_tf(sample)
            sample = jax.tree_util.tree_map(lambda x: x[:1], sample)
        params = model.init(key, sample)
        if total_updates:
            n_minib = total_updates * config.update_epochs * config.num_minibatches
            lr = optax.linear_schedule(config.lr, 0.0, n_minib)
        else:
            lr = config.lr
        tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(lr),
        )
        opt_state = tx.init(params)
        return params, opt_state, tx

    def rollout(params, data, obs, elapsed, key):
        def body(carry, _):
            data, obs, elapsed, key = carry
            key, akey, rkey = jax.random.split(key, 3)
            mean, log_std, value = model.apply(params, obs)
            std = jnp.exp(log_std)
            action = mean + std * jax.random.normal(akey, mean.shape)
            logp = -0.5 * jnp.sum(
                ((action - mean) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi),
                axis=-1,
            )
            new_data, new_obs, reward, terminated = step_fn(data, action)
            elapsed = elapsed + 1
            if config.ignore_terminations:
                truncated = elapsed >= max_steps
                done = truncated
            else:
                truncated = (elapsed >= max_steps) & ~terminated
                done = terminated | truncated
            # bootstrap EVERY episode boundary with V(final_obs) — the
            # reference bootstraps terminated episodes too (ppo_fast.py:233
            # final_values), which removes the perverse incentive to avoid
            # success-termination (ending early would otherwise forfeit the
            # discounted stream of dense hold-reward)
            _, _, v_final = model.apply(params, new_obs)
            reward = reward + config.gamma * v_final * done.astype(jnp.float32)
            # SAME_STEP autoreset (vector/wrappers/gymnasium.py:127-184)
            keys = jax.random.split(rkey, num_envs)
            reset_data, reset_obs = reset_fn(new_data, done, keys)
            elapsed = jnp.where(done, 0, elapsed)
            out = (obs, action, logp, reward, done, value, terminated)
            return (reset_data, reset_obs, elapsed, key), out

        (data, obs, elapsed, key), traj = jax.lax.scan(
            body, (data, obs, elapsed, key), None, length=config.rollout_steps
        )
        return data, obs, elapsed, key, traj

    def compute_gae(traj, last_value):
        obs, actions, logps, rewards, dones, values, terms = traj

        def body(carry, t):
            gae, next_value = carry
            delta = (
                rewards[t]
                + config.gamma * next_value * (1 - dones[t].astype(jnp.float32))
                - values[t]
            )
            gae = (
                delta
                + config.gamma
                * config.gae_lambda
                * (1 - dones[t].astype(jnp.float32))
                * gae
            )
            return (gae, values[t]), gae

        T = rewards.shape[0]
        (_, _), advs = jax.lax.scan(
            body,
            (jnp.zeros_like(last_value), last_value),
            jnp.arange(T - 1, -1, -1),
        )
        advs = advs[::-1]
        returns = advs + values
        return advs, returns

    def ppo_loss(params, batch):
        obs, actions, old_logp, advs, returns = batch
        mean, log_std, value = model.apply(params, obs)
        std = jnp.exp(log_std)
        logp = -0.5 * jnp.sum(
            ((actions - mean) / std) ** 2 + 2 * log_std + jnp.log(2 * jnp.pi), axis=-1
        )
        ratio = jnp.exp(jnp.clip(logp - old_logp, -20.0, 20.0))
        advs_n = (advs - advs.mean()) / (advs.std() + 1e-8)
        pg1 = ratio * advs_n
        pg2 = jnp.clip(ratio, 1 - config.clip_eps, 1 + config.clip_eps) * advs_n
        pg_loss = -jnp.mean(jnp.minimum(pg1, pg2))
        v_loss = 0.5 * jnp.mean((value - returns) ** 2)
        entropy = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
        return pg_loss + config.vf_coef * v_loss - config.ent_coef * entropy

    def train_step(params, opt_state, tx, data, obs, elapsed, key):
        if visual and isinstance(obs, dict) and "sensor_data" in obs:
            obs = obs_tf(obs)
        data, obs, elapsed, key, traj = rollout(params, data, obs, elapsed, key)
        _, _, last_value = model.apply(params, obs)
        advs, returns = compute_gae(traj, last_value)
        t_obs, t_act, t_logp, t_rew, t_done, t_val, t_term = traj
        flat = lambda t: jax.tree_util.tree_map(
            lambda x: x.reshape((-1,) + x.shape[2:]), t
        )
        batch = (flat(t_obs), flat(t_act), flat(t_logp), flat(advs), flat(returns))

        def epoch(carry, _):
            params, opt_state, key = carry
            key, pkey = jax.random.split(key)
            n = batch[1].shape[0]  # actions (B*T, A); batch[0] may be a dict
            perm = jax.random.permutation(pkey, n)
            mb_size = n // config.num_minibatches

            def mb_update(carry, i):
                params, opt_state = carry
                idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)
                mb = jax.tree_util.tree_map(lambda b: b[idx], batch)
                loss, grads = jax.value_and_grad(ppo_loss)(params, mb)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                mb_update, (params, opt_state), jnp.arange(config.num_minibatches)
            )
            return (params, opt_state, key), losses.mean()

        (params, opt_state, key), losses = jax.lax.scan(
            epoch, (params, opt_state, key), None, length=config.update_epochs
        )
        mean_reward = t_rew.mean()
        flat_params = jax.tree_util.tree_leaves(params)
        bad_params = sum(jnp.sum(~jnp.isfinite(p)) for p in flat_params)
        done_ct = jnp.maximum(t_done.sum(), 1)
        metrics = dict(
            loss=losses.mean(),
            mean_reward=mean_reward,
            # fraction of finished episodes that ended by termination
            # (success|fail) rather than truncation — for success-only tasks
            # this IS the success rate
            ep_success=t_term.sum() / done_ct,
            bad_params=bad_params,
            bad_rewards=jnp.sum(~jnp.isfinite(t_rew)),
            term_frac=t_term.mean(),
            bad_obs=sum(
                jnp.sum(~jnp.isfinite(x.astype(jnp.float32)))
                for x in jax.tree_util.tree_leaves(t_obs)
            ),
            max_action=jnp.max(jnp.abs(t_act)),
            max_adv=jnp.max(jnp.abs(advs)),
        )
        return params, opt_state, data, obs, elapsed, key, metrics

    return model, init_state, train_step


def make_sharded_ppo_step(
    mesh: Mesh,
    num_envs: int,
    env_id: str = "PushCube-v1",
    config: PPOConfig = PPOConfig(rollout_steps=2, update_epochs=1, num_minibatches=1),
    smoke: bool = False,
):
    """jit the FULL PPO train step over a mesh with the env axis sharded
    (dp over envs; params replicated — XLA inserts the grad psum over ICI)."""
    import maniskill_tpu.envs  # noqa: F401  (registers tasks)
    from maniskill_tpu.utils.registration import make

    env = make(env_id, num_envs=num_envs, obs_mode="state")
    base = env.unwrapped
    obs, _ = env.reset(seed=0)
    obs_dim = obs.shape[-1]

    model, init_state, train_step = make_train_step(env, config)
    key = jax.random.PRNGKey(0)
    params, opt_state, tx = init_state(key, obs_dim)

    env_sharding = NamedSharding(mesh, P("env"))
    repl = NamedSharding(mesh, P())

    shard_env = lambda tree: jax.tree_util.tree_map(
        lambda x: jax.device_put(x, env_sharding), tree
    )
    data = shard_env(base.scene.data)
    obs = jax.device_put(obs, env_sharding)
    elapsed = jax.device_put(jnp.zeros(num_envs, jnp.int32), env_sharding)
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)

    step = jax.jit(lambda p, o, d, ob, el, k: train_step(p, o, tx, d, ob, el, k))

    def run_once():
        nonlocal params, opt_state, data, obs, elapsed, key
        params, opt_state, data, obs, elapsed, key, metrics = step(
            params, opt_state, data, obs, elapsed, key
        )
        jax.block_until_ready(metrics["loss"])
        return metrics

    metrics = run_once()
    if smoke:
        print(
            "dryrun_multichip ok:",
            {k: float(v) for k, v in metrics.items()},
            "devices:", len(mesh.devices.flatten()),
        )
    return run_once, env

"""TD-MPC2, fully on-device (counterpart of the reference's
examples/baselines/tdmpc2: tdmpc2.py:9-316, common/world_model.py,
common/math.py, common/scale.py — reimplemented jax-native).

TPU-first design mirrors parallel/sac.py: the replay ring lives on device as
(steps, envs, dim) arrays and one `train_step` jit fuses environment
collection (lax.scan over physics steps, with the MPPI planner inlined),
ring insertion, subsequence sampling, and model/policy updates. The MPPI
planner is fully batched over (envs, samples) so every latent rollout is a
large MXU matmul; the 6 planner iterations are a lax.fori_loop.

Algorithm parity (reference file:line):
- SimNorm latent, NormedLinear (Dense+LayerNorm+mish) stacks
  (common/layers.py, world_model.py)
- two-hot discrete regression of reward/value over 101 symlog bins
  (common/math.py:49-95)
- MPPI with policy-prior trajectories, elite softmax re-fit, prev-mean
  warm start (tdmpc2.py:106-199)
- latent consistency + reward + value losses with rho^t weighting
  (tdmpc2.py:247-316), policy update on detached latents with
  running-percentile Q scale (tdmpc2.py:201-226, common/scale.py)
- EMA target Q ensemble, encoder lr scale, grad clip 20 (config.yaml)
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .train import make_env_step_fns


class TDMPC2Config(NamedTuple):
    # planning
    mpc: bool = True
    horizon: int = 3
    num_samples: int = 512
    num_elites: int = 64
    num_pi_trajs: int = 24
    iterations: int = 6
    temperature: float = 0.5
    min_std: float = 0.05
    max_std: float = 2.0
    # architecture
    latent_dim: int = 512
    simnorm_dim: int = 8
    enc_dim: int = 256
    num_enc_layers: int = 2
    mlp_dim: int = 512
    num_q: int = 5
    dropout: float = 0.01
    # discrete regression
    num_bins: int = 101
    vmin: float = -10.0
    vmax: float = 10.0
    # optimization
    lr: float = 3e-4
    enc_lr_scale: float = 0.3
    grad_clip_norm: float = 20.0
    tau: float = 0.01
    rho: float = 0.5
    consistency_coef: float = 20.0
    reward_coef: float = 0.1
    value_coef: float = 0.1
    entropy_coef: float = 1e-4
    log_std_min: float = -10.0
    log_std_max: float = 2.0
    # training loop
    rollout_steps: int = 4
    buffer_steps: int = 1024
    batch_size: int = 256
    num_updates: int = 2  # gradient updates per train_step
    # discount heuristic (tdmpc2.py:39-51)
    discount_denom: float = 5.0
    discount_min: float = 0.95
    discount_max: float = 0.995


# ---------------------------------------------------------------------------
# math: symlog two-hot regression (reference common/math.py:49-95)
# ---------------------------------------------------------------------------

def symlog(x):
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def symexp(x):
    return jnp.sign(x) * (jnp.exp(jnp.abs(x)) - 1.0)


def two_hot(x, cfg: TDMPC2Config):
    """Scalar -> soft two-hot target over symlog-spaced bins. x: (...,)."""
    bin_size = (cfg.vmax - cfg.vmin) / (cfg.num_bins - 1)
    x = jnp.clip(symlog(x), cfg.vmin, cfg.vmax)
    idx = jnp.floor((x - cfg.vmin) / bin_size).astype(jnp.int32)
    off = (x - cfg.vmin) / bin_size - idx.astype(x.dtype)
    lo = jax.nn.one_hot(idx, cfg.num_bins) * (1.0 - off)[..., None]
    hi = jax.nn.one_hot((idx + 1) % cfg.num_bins, cfg.num_bins) * off[..., None]
    return lo + hi


def two_hot_inv(logits, cfg: TDMPC2Config):
    """Soft two-hot logits -> scalar. logits: (..., num_bins) -> (...,)."""
    bins = jnp.linspace(cfg.vmin, cfg.vmax, cfg.num_bins)
    p = jax.nn.softmax(logits, axis=-1)
    return symexp(jnp.sum(p * bins, axis=-1))


def soft_ce(logits, target, cfg: TDMPC2Config):
    """Cross entropy against the two-hot encoding of scalar target."""
    return -jnp.sum(two_hot(target, cfg) * jax.nn.log_softmax(logits, -1), -1)


# ---------------------------------------------------------------------------
# networks (reference common/layers.py, world_model.py)
# ---------------------------------------------------------------------------

class SimNorm(nn.Module):
    """Simplicial normalization: softmax over groups of `dim`."""

    dim: int = 8

    @nn.compact
    def __call__(self, x):
        shp = x.shape
        x = x.reshape(shp[:-1] + (shp[-1] // self.dim, self.dim))
        return jax.nn.softmax(x, axis=-1).reshape(shp)


class NormedLinear(nn.Module):
    features: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features)(x)
        x = nn.LayerNorm()(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x * jnp.tanh(jax.nn.softplus(x))  # mish


class Encoder(nn.Module):
    cfg: TDMPC2Config

    @nn.compact
    def __call__(self, obs):
        x = obs
        for _ in range(self.cfg.num_enc_layers):
            x = NormedLinear(self.cfg.enc_dim)(x)
        x = nn.Dense(self.cfg.latent_dim)(x)
        return SimNorm(self.cfg.simnorm_dim)(x)


class Dynamics(nn.Module):
    cfg: TDMPC2Config

    @nn.compact
    def __call__(self, z, a):
        x = jnp.concatenate([z, a], axis=-1)
        for _ in range(2):
            x = NormedLinear(self.cfg.mlp_dim)(x)
        x = nn.Dense(self.cfg.latent_dim)(x)
        return SimNorm(self.cfg.simnorm_dim)(x)


class RewardHead(nn.Module):
    cfg: TDMPC2Config

    @nn.compact
    def __call__(self, z, a):
        x = jnp.concatenate([z, a], axis=-1)
        for _ in range(2):
            x = NormedLinear(self.cfg.mlp_dim)(x)
        return nn.Dense(self.cfg.num_bins)(x)


class QEnsemble(nn.Module):
    """num_q independent two-hot Q heads, vmapped over the ensemble axis."""

    cfg: TDMPC2Config

    @nn.compact
    def __call__(self, z, a, train: bool = False):
        x = jnp.concatenate([z, a], axis=-1)

        def head(mdl, x):
            h = NormedLinear(self.cfg.mlp_dim, dropout=self.cfg.dropout)(
                x, train=train
            )
            h = NormedLinear(self.cfg.mlp_dim)(h)
            return nn.Dense(self.cfg.num_bins)(h)

        ens = nn.vmap(
            head,
            in_axes=None, out_axes=0,
            axis_size=self.cfg.num_q,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
        )
        return ens(self, x)  # (num_q, ..., num_bins)


class PolicyPrior(nn.Module):
    cfg: TDMPC2Config
    act_dim: int

    @nn.compact
    def __call__(self, z):
        x = z
        for _ in range(2):
            x = NormedLinear(self.cfg.mlp_dim)(x)
        mu = nn.Dense(self.act_dim)(x)
        log_std_raw = nn.Dense(self.act_dim)(x)
        lo, hi = self.cfg.log_std_min, self.cfg.log_std_max
        log_std = lo + 0.5 * (hi - lo) * (jnp.tanh(log_std_raw) + 1.0)
        return mu, log_std


def _pi_sample(policy, params, z, key):
    """Squashed-Gaussian sample + log-prob (tdmpc2 world_model.pi)."""
    mu, log_std = policy.apply(params, z)
    eps = jax.random.normal(key, mu.shape)
    pre = mu + jnp.exp(log_std) * eps
    act = jnp.tanh(pre)
    logp = -0.5 * (eps**2 + 2 * log_std + jnp.log(2 * jnp.pi))
    logp = logp - jnp.log(1.0 - act**2 + 1e-6)
    return jnp.tanh(mu), act, jnp.sum(logp, axis=-1), log_std


class TDMPC2State(NamedTuple):
    model_params: dict      # encoder/dynamics/reward/Qs
    pi_params: dict
    q_target: dict          # target params of the Q ensemble
    model_opt: optax.OptState
    pi_opt: optax.OptState
    q_scale: jax.Array      # RunningScale value
    # device replay ring
    buf_obs: jax.Array
    buf_act: jax.Array
    buf_rew: jax.Array
    ptr: jax.Array
    filled: jax.Array
    # MPPI warm start
    prev_mean: jax.Array    # (num_envs, horizon, act_dim)
    key: jax.Array


def make_tdmpc2_step(env, config: TDMPC2Config = TDMPC2Config()):
    """Build (init_state, train_step, act) for fused on-device TD-MPC2."""
    cfg = config
    base = env.unwrapped
    num_envs = base.num_envs
    act_dim = int(np.prod(base.single_action_space.shape))
    step_fn, reset_fn = make_env_step_fns(env)

    from ..utils.gym_utils import find_max_episode_steps_value

    ep_len = find_max_episode_steps_value(env) or 50
    assert cfg.buffer_steps % ep_len == 0, "ring must hold whole episodes"
    assert ep_len > cfg.horizon, "episodes shorter than the planning horizon"

    # discount heuristic (tdmpc2.py:39-51)
    frac = ep_len / cfg.discount_denom
    discount = float(
        np.clip((frac - 1) / frac, cfg.discount_min, cfg.discount_max)
    )
    iterations = cfg.iterations + 2 * int(act_dim >= 20)

    encoder = Encoder(cfg)
    dynamics = Dynamics(cfg)
    reward_head = RewardHead(cfg)
    qnet = QEnsemble(cfg)
    policy = PolicyPrior(cfg, act_dim)

    model_tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm), optax.adam(cfg.lr)
    )
    pi_tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip_norm),
        optax.adam(cfg.lr, eps=1e-5),
    )

    def _q_value(model_params, q_params, z, a, mode, key=None):
        train = key is not None
        rngs = {"dropout": key} if train else None
        logits = qnet.apply(q_params, z, a, train=train, rngs=rngs)
        vals = two_hot_inv(logits, cfg)  # (num_q, ...)
        if mode == "min2":
            # random-2 min like the reference's subsample; fixed first two
            # heads keeps it jit-static (reference samples 2 of 5)
            return jnp.min(vals[:2], axis=0)
        return jnp.mean(vals, axis=0)

    def init_state(key, obs_dim) -> TDMPC2State:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        zo = jnp.zeros((1, obs_dim))
        za = jnp.zeros((1, act_dim))
        zl = jnp.zeros((1, cfg.latent_dim))
        model_params = {
            "enc": encoder.init(k1, zo),
            "dyn": dynamics.init(k2, zl, za),
            "rew": reward_head.init(k3, zl, za),
            "q": qnet.init(k4, zl, za),
        }
        pi_params = policy.init(k5, zl)
        S, B = cfg.buffer_steps, num_envs
        return TDMPC2State(
            model_params=model_params,
            pi_params=pi_params,
            q_target=jax.tree.map(lambda x: x, model_params["q"]),
            model_opt=model_tx.init(model_params),
            pi_opt=pi_tx.init(pi_params),
            q_scale=jnp.ones(()),
            buf_obs=jnp.zeros((S, B, obs_dim)),
            buf_act=jnp.zeros((S, B, act_dim)),
            buf_rew=jnp.zeros((S, B)),
            ptr=jnp.zeros((), jnp.int32),
            filled=jnp.zeros((), jnp.int32),
            prev_mean=jnp.zeros((B, cfg.horizon, act_dim)),
            key=key,
        )

    # -- planner (tdmpc2.py:106-199) --------------------------------------

    def _estimate_value(mp, pi_params, z, actions):
        """z: (B, N, L); actions: (B, H, N, A) -> (B, N)."""
        def body(carry, a_t):
            z, G, disc = carry
            r = two_hot_inv(reward_head.apply(mp["rew"], z, a_t), cfg)
            z = dynamics.apply(mp["dyn"], z, a_t)
            return (z, G + disc * r, disc * discount), None

        a_seq = jnp.moveaxis(actions, 1, 0)  # (H, B, N, A)
        (z, G, disc), _ = jax.lax.scan(body, (z, jnp.zeros(z.shape[:-1]), 1.0), a_seq)
        mu, _, _, _ = _pi_sample(policy, pi_params, z, jax.random.PRNGKey(0))
        return G + disc * _q_value(mp, mp["q"], z, mu, "avg")

    def plan(state: TDMPC2State, z, t0, key, eval_mode=False):
        """z: (B, L); t0: (B,) bool. Returns action (B, A), new prev_mean."""
        mp = state.model_params
        B, H, N, A = num_envs, cfg.horizon, cfg.num_samples, act_dim
        kpi, kiter, kfinal, knoise = jax.random.split(key, 4)

        # policy-prior trajectories
        zp = jnp.repeat(z[:, None], cfg.num_pi_trajs, axis=1)  # (B, P, L)

        def pi_body(carry, k):
            zp = carry
            _, a, _, _ = _pi_sample(policy, state.pi_params, zp, k)
            zp = dynamics.apply(mp["dyn"], zp, a)
            return zp, a

        _, pi_actions = jax.lax.scan(
            pi_body, zp, jax.random.split(kpi, H)
        )  # (H, B, P, A)
        pi_actions = jnp.moveaxis(pi_actions, 0, 1)  # (B, H, P, A)

        zs = jnp.repeat(z[:, None], N, axis=1)  # (B, N, L)
        mean0 = jnp.where(
            t0[:, None, None],
            jnp.zeros((B, H, A)),
            jnp.concatenate(
                [state.prev_mean[:, 1:], jnp.zeros((B, 1, A))], axis=1
            ),
        )
        std0 = jnp.full((B, H, A), cfg.max_std)

        def iter_body(i, carry):
            mean, std, _, _ = carry
            k = jax.random.fold_in(kiter, i)
            noise = jax.random.normal(k, (B, H, N - cfg.num_pi_trajs, A))
            sampled = jnp.clip(
                mean[:, :, None] + std[:, :, None] * noise, -1, 1
            )
            actions = jnp.concatenate([pi_actions, sampled], axis=2)
            value = jnp.nan_to_num(
                _estimate_value(mp, state.pi_params, zs, actions)
            )  # (B, N)
            elite_val, elite_idx = jax.lax.top_k(value, cfg.num_elites)
            elite_actions = jnp.take_along_axis(
                actions, elite_idx[:, None, :, None], axis=2
            )  # (B, H, E, A)
            score = jax.nn.softmax(
                cfg.temperature * (elite_val - elite_val[:, :1]), axis=1
            )  # (B, E)
            w = score[:, None, :, None]
            mean = jnp.sum(w * elite_actions, axis=2)
            var = jnp.sum(w * (elite_actions - mean[:, :, None]) ** 2, axis=2)
            std = jnp.clip(jnp.sqrt(var), cfg.min_std, cfg.max_std)
            return mean, std, elite_actions, score

        mean, std, elite_actions, score = jax.lax.fori_loop(
            0, iterations, iter_body,
            (mean0, std0,
             jnp.zeros((B, H, cfg.num_elites, A)),
             jnp.full((B, cfg.num_elites), 1.0 / cfg.num_elites)),
        )

        # sample one elite by score (tdmpc2.py:185-190)
        pick = jax.random.categorical(kfinal, jnp.log(score + 1e-9), axis=-1)
        a_traj = jnp.take_along_axis(
            elite_actions, pick[:, None, None, None], axis=2
        )[:, :, 0]  # (B, H, A)
        a = a_traj[:, 0]
        if not eval_mode:
            a = a + std[:, 0] * jax.random.normal(knoise, (B, A))
        return jnp.clip(a, -1, 1), mean

    def act(state: TDMPC2State, obs, t0, key, eval_mode=True):
        z = encoder.apply(state.model_params["enc"], obs)
        if cfg.mpc:
            a, mean = plan(state, z, t0, key, eval_mode=eval_mode)
            return a, state._replace(prev_mean=mean)
        mu, a, _, _ = _pi_sample(policy, state.pi_params, z, key)
        return (mu if eval_mode else a), state

    # -- collection --------------------------------------------------------

    def collect(state: TDMPC2State, data, obs, elapsed, key):
        def body(carry, _):
            state, data, obs, elapsed, key = carry
            key, akey, rkey = jax.random.split(key, 3)
            t0 = elapsed == 0
            z = encoder.apply(state.model_params["enc"], obs)
            if cfg.mpc:
                action, mean = plan(state, z, t0, akey, eval_mode=False)
                state = state._replace(prev_mean=mean)
            else:
                _, action, _, _ = _pi_sample(policy, state.pi_params, z, akey)
            new_data, next_obs, reward, _term = step_fn(data, action)
            elapsed = elapsed + 1
            # fixed-length episodes: ignore terminations (reference
            # envs/maniskill.py uses ignore_terminations=True)
            done = elapsed >= ep_len
            keys = jax.random.split(rkey, num_envs)
            reset_data, reset_obs = reset_fn(new_data, done, keys)
            elapsed = jnp.where(done, 0, elapsed)
            return (state, reset_data, reset_obs, elapsed, key), (obs, action, reward)

        (state, data, obs, elapsed, key), traj = jax.lax.scan(
            body, (state, data, obs, elapsed, key), None,
            length=cfg.rollout_steps,
        )
        o, a, r = traj
        state = state._replace(
            buf_obs=jax.lax.dynamic_update_slice_in_dim(state.buf_obs, o, state.ptr, 0),
            buf_act=jax.lax.dynamic_update_slice_in_dim(state.buf_act, a, state.ptr, 0),
            buf_rew=jax.lax.dynamic_update_slice_in_dim(state.buf_rew, r, state.ptr, 0),
            ptr=(state.ptr + cfg.rollout_steps) % cfg.buffer_steps,
            filled=jnp.minimum(state.filled + cfg.rollout_steps, cfg.buffer_steps),
        )
        return state, data, obs, elapsed, key

    # -- update (tdmpc2.py:228-316) ----------------------------------------

    def _sample_seq(state: TDMPC2State, key):
        """Sample (H+1)-step subsequences that never cross an episode
        boundary: pick an episode row and an offset in [0, ep_len-H-1]."""
        k1, k2, k3 = jax.random.split(key, 3)
        n_ep = jnp.maximum(state.filled // ep_len, 1)
        ep = jax.random.randint(k1, (cfg.batch_size,), 0, n_ep)
        off = jax.random.randint(k2, (cfg.batch_size,), 0, ep_len - cfg.horizon)
        env = jax.random.randint(k3, (cfg.batch_size,), 0, num_envs)
        s0 = ep * ep_len + off  # (batch,)
        steps = s0[None, :] + jnp.arange(cfg.horizon + 1)[:, None]  # (H+1, b)
        obs = state.buf_obs[steps, env[None]]          # (H+1, b, obs)
        act = state.buf_act[steps[:-1], env[None]]     # (H, b, act)
        rew = state.buf_rew[steps[:-1], env[None]]     # (H, b)
        return obs, act, rew

    def model_loss(model_params, state: TDMPC2State, batch, key):
        obs, action, reward = batch
        H = cfg.horizon
        # targets
        next_z = encoder.apply(model_params["enc"], obs[1:])  # (H, b, L)
        next_z = jax.lax.stop_gradient(next_z)
        kpi, kq = jax.random.split(key)
        _, pi_a, _, _ = _pi_sample(policy, state.pi_params, next_z, kpi)
        td_target = reward + discount * _q_value(
            model_params, state.q_target, next_z, pi_a, "min2"
        )
        td_target = jax.lax.stop_gradient(td_target)  # (H, b)

        # latent rollout
        def roll(z, a_t):
            z = dynamics.apply(model_params["dyn"], z, a_t)
            return z, z

        z0 = encoder.apply(model_params["enc"], obs[0])
        _, zs = jax.lax.scan(roll, z0, action)  # (H, b, L)
        rho_t = cfg.rho ** jnp.arange(H)
        consistency = jnp.mean(
            jnp.mean((zs - next_z) ** 2, axis=-1) * rho_t[:, None]
        )

        zs_in = jnp.concatenate([z0[None], zs[:-1]], axis=0)  # (H, b, L)
        r_logits = reward_head.apply(model_params["rew"], zs_in, action)
        reward_loss = jnp.mean(soft_ce(r_logits, reward, cfg) * rho_t[:, None])
        q_logits = qnet.apply(
            model_params["q"], zs_in, action, train=True,
            rngs={"dropout": kq},
        )  # (num_q, H, b, bins)
        value_loss = jnp.mean(
            soft_ce(q_logits, td_target[None], cfg) * rho_t[None, :, None]
        )
        total = (
            cfg.consistency_coef * consistency
            + cfg.reward_coef * reward_loss
            + cfg.value_coef * value_loss
        )
        zs_all = jnp.concatenate([z0[None], zs], axis=0)
        return total, (consistency, reward_loss, value_loss, zs_all)

    def pi_loss_fn(pi_params, state: TDMPC2State, zs, key):
        """zs: (H+1, b, L) detached latents."""
        _, pis, log_pis, _ = _pi_sample(policy, pi_params, zs, key)
        qs = _q_value(
            state.model_params, state.model_params["q"], zs, pis, "avg"
        )  # (H+1, b)
        scale = jnp.maximum(state.q_scale, 1.0)
        rho_t = cfg.rho ** jnp.arange(cfg.horizon + 1)
        loss = jnp.mean(
            jnp.mean(cfg.entropy_coef * log_pis - qs / scale, axis=-1) * rho_t
        )
        return loss, qs

    def update_once(state: TDMPC2State, key):
        k1, k2, k3 = jax.random.split(key, 3)
        batch = _sample_seq(state, k1)
        (tl, (cl, rl, vl, zs)), grads = jax.value_and_grad(
            model_loss, has_aux=True
        )(state.model_params, state, batch, k2)
        # encoder lr scale (tdmpc2.py:21-27)
        grads["enc"] = jax.tree.map(
            lambda g: g * cfg.enc_lr_scale, grads["enc"]
        )
        up, model_opt = model_tx.update(grads, state.model_opt)
        model_params = optax.apply_updates(state.model_params, up)
        state = state._replace(model_params=model_params, model_opt=model_opt)

        zs = jax.lax.stop_gradient(zs)
        (pl, qs), pg = jax.value_and_grad(pi_loss_fn, has_aux=True)(
            state.pi_params, state, zs, k3
        )
        pup, pi_opt = pi_tx.update(pg, state.pi_opt)
        pi_params = optax.apply_updates(state.pi_params, pup)

        # RunningScale update on the first-step Qs (common/scale.py:37-41)
        q0 = qs[0]
        lo = jnp.percentile(q0, 5.0)
        hi = jnp.percentile(q0, 95.0)
        new_scale = state.q_scale + cfg.tau * (
            jnp.maximum(hi - lo, 1.0) - state.q_scale
        )

        q_target = jax.tree.map(
            lambda t, p: t * (1 - cfg.tau) + p * cfg.tau,
            state.q_target, model_params["q"],
        )
        state = state._replace(
            pi_params=pi_params, pi_opt=pi_opt,
            q_scale=new_scale, q_target=q_target,
        )
        return state, (cl, rl, vl, pl, tl)

    def train_step(state: TDMPC2State, data, obs, elapsed, key, learn):
        key, ckey, ukey = jax.random.split(key, 3)
        state, data, obs, elapsed, ckey = collect(state, data, obs, elapsed, ckey)

        def do_updates(state):
            def body(st, k):
                return update_once(st, k)

            state, losses = jax.lax.scan(
                body, state, jax.random.split(ukey, cfg.num_updates)
            )
            return state, jax.tree.map(jnp.mean, losses)

        def skip(state):
            z = jnp.zeros(())
            return state, (z, z, z, z, z)

        state, (cl, rl, vl, pl, tl) = jax.lax.cond(
            learn, do_updates, skip, state
        )
        metrics = dict(
            consistency_loss=cl, reward_loss=rl, value_loss=vl,
            pi_loss=pl, total_loss=tl, q_scale=state.q_scale,
        )
        return state, data, obs, elapsed, key, metrics

    return init_state, train_step, act

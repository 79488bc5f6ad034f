"""Diffusion Policy baseline (counterpart of
examples/baselines/diffusion_policy in the reference, after Chi et al.
2023), pure JAX/flax.

A conditional DDPM over action chunks: given an observation-history
window, the model denoises a horizon of future actions; at eval the first
``act_steps`` denoised actions execute before re-planning. The denoiser is
an MLP over [noisy action chunk, obs window, timestep embedding] — the
1D-UNet of the original is overkill for state-based chunks and an MLP
keeps the whole trainer one fused jit.

Usage:
    python -m maniskill_tpu.examples.baselines.diffusion_policy \
        --traj-path out/demos.h5 --env-id PickCube-v1 --epochs 200
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--traj-path", required=True)
    p.add_argument("--env-id", default=None, help="evaluate after training")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--horizon", type=int, default=8, help="action chunk length")
    p.add_argument("--obs-window", type=int, default=2)
    p.add_argument("--act-steps", type=int, default=4, help="actions executed per plan")
    p.add_argument("--diffusion-steps", type=int, default=50)
    p.add_argument("--eval-episodes", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _flatten_obs(o, batch_dims):
    if isinstance(o, dict):
        parts = [_flatten_obs(v, batch_dims) for _, v in sorted(o.items())]
        return np.concatenate(parts, axis=-1)
    o = np.asarray(o, np.float32)
    return o.reshape(o.shape[:batch_dims] + (-1,))


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax

    from maniskill_tpu.trajectory.dataset import ManiSkillTrajectoryDataset

    ds = ManiSkillTrajectoryDataset(args.traj_path)
    H, W = args.horizon, args.obs_window

    # build (obs window, action chunk) pairs per episode
    OBS, CHUNK = [], []
    for ep in range(len(ds.actions)):
        acts = np.asarray(ds.actions[ep], np.float32)
        batched = acts.ndim == 3
        obs = _flatten_obs(ds.obs[ep], 2 if batched else 1)
        if batched:  # (T, B, ...) -> iterate env columns
            for b in range(acts.shape[1]):
                OBS_, CH_ = _windows(obs[:, b], acts[:, b], W, H)
                OBS.append(OBS_), CHUNK.append(CH_)
        else:
            OBS_, CH_ = _windows(obs, acts, W, H)
            OBS.append(OBS_), CHUNK.append(CH_)
    X = np.concatenate(OBS, 0)  # (N, W*obs_dim)
    Y = np.concatenate(CHUNK, 0)  # (N, H, act_dim)
    A = Y.shape[-1]
    print(f"dataset: {X.shape[0]} windows, obs {X.shape[1]}, chunk {H}x{A}")

    T_DIFF = args.diffusion_steps
    betas = np.linspace(1e-4, 0.02, T_DIFF, dtype=np.float32)
    alphas = 1.0 - betas
    alpha_bar = np.cumprod(alphas)
    ab = jnp.asarray(alpha_bar)

    class Denoiser(nn.Module):
        @nn.compact
        def __call__(self, noisy_chunk, obs, t):
            # sinusoidal timestep embedding
            half = 32
            freqs = jnp.exp(-np.log(1e4) * jnp.arange(half) / half)
            emb = t[:, None] * freqs[None]
            temb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
            x = jnp.concatenate(
                [noisy_chunk.reshape(noisy_chunk.shape[0], -1), obs, temb], -1
            )
            for _ in range(4):
                x = nn.gelu(nn.Dense(args.hidden)(x))
            eps = nn.Dense(H * A)(x)
            return eps.reshape(-1, H, A)

    model = Denoiser()
    key = jax.random.PRNGKey(args.seed)
    params = model.init(
        key, jnp.zeros((1, H, A)), jnp.zeros((1, X.shape[1])), jnp.zeros((1,))
    )
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    n = X.shape[0]
    bs = min(args.batch_size, n)
    nb = max(1, n // bs)

    @jax.jit
    def epoch_step(params, opt_state, key):
        perm_key, key = jax.random.split(key)
        perm = jax.random.permutation(perm_key, n)

        def mb(carry, i):
            params, opt_state, key = carry
            key, tk, nk = jax.random.split(key, 3)
            idx = jax.lax.dynamic_slice_in_dim(perm, i * bs, bs)
            obs, chunk = Xd[idx], Yd[idx]
            t = jax.random.randint(tk, (bs,), 0, T_DIFF)
            noise = jax.random.normal(nk, chunk.shape)
            abt = ab[t][:, None, None]
            noisy = jnp.sqrt(abt) * chunk + jnp.sqrt(1 - abt) * noise

            def loss_fn(p):
                eps = model.apply(p, noisy, obs, t.astype(jnp.float32))
                return jnp.mean((eps - noise) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt_state = tx.update(g, opt_state)
            params = optax.apply_updates(params, up)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            mb, (params, opt_state, key), jnp.arange(nb)
        )
        return params, opt_state, key, jnp.mean(losses)

    t0 = time.time()
    for e in range(args.epochs):
        params, opt_state, key, loss = epoch_step(params, opt_state, key)
        if e % max(1, args.epochs // 10) == 0 or e == args.epochs - 1:
            print(
                f"epoch {e}/{args.epochs} eps-mse {float(loss):.5f} "
                f"({time.time()-t0:.1f}s)",
                flush=True,
            )

    @jax.jit
    def sample_chunk(params, obs, key):
        """DDPM ancestral sampling of one action chunk per env."""
        B = obs.shape[0]
        x = jax.random.normal(key, (B, H, A))

        def body(t, carry):
            x, key = carry
            ti = T_DIFF - 1 - t
            key, nk = jax.random.split(key)
            eps = model.apply(
                params, x, obs, jnp.full((B,), ti, jnp.float32)
            )
            a_t, ab_t = alphas[0] * 0 + jnp.asarray(alphas)[ti], ab[ti]
            x = (x - (1 - a_t) / jnp.sqrt(1 - ab_t) * eps) / jnp.sqrt(a_t)
            noise = jax.random.normal(nk, x.shape)
            x = x + jnp.where(ti > 0, jnp.sqrt(jnp.asarray(betas)[ti]), 0.0) * noise
            return (x, key)

        x, _ = jax.lax.fori_loop(0, T_DIFF, body, (x, key))
        return jnp.clip(x, -1.0, 1.0)

    if args.env_id:
        import maniskill_tpu.envs  # noqa: F401
        from maniskill_tpu.utils.registration import make

        env = make(args.env_id, num_envs=args.eval_episodes, obs_mode="state")
        obs, _ = env.reset(seed=123)
        obs_hist = [np.asarray(obs)] * W
        success = np.zeros(args.eval_episodes, bool)
        for t in range(0, 50, args.act_steps):
            window = jnp.asarray(np.concatenate(obs_hist[-W:], axis=-1))
            key, sk = jax.random.split(key)
            chunk = sample_chunk(params, window, sk)
            for k in range(args.act_steps):
                obs, rew, term, trunc, info = env.step(chunk[:, k])
                obs_hist.append(np.asarray(obs))
            success |= np.asarray(info["success"])
        print(f"eval success_once: {success.mean():.3f}")
        env.close()


def _windows(obs, acts, W, H):
    """obs (T+1, D), acts (T, A) -> windows (N, W*D) and chunks (N, H, A)."""
    T = len(acts)
    OBS, CH = [], []
    for t in range(T):
        w = [obs[max(0, t - i)] for i in range(W - 1, -1, -1)]
        chunk = [acts[min(t + i, T - 1)] for i in range(H)]
        OBS.append(np.concatenate(w, -1))
        CH.append(np.stack(chunk))
    return np.stack(OBS), np.stack(CH)


if __name__ == "__main__":
    main()

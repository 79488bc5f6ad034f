"""ACT baseline (counterpart of examples/baselines/act in the reference,
after Zhao et al. 2023 "Learning Fine-Grained Bimanual Manipulation with
Low-Cost Hardware"), pure JAX/flax.

A CVAE action-chunking transformer: a style latent z is inferred from the
(state, action-chunk) pair at training time (KL-regularized to N(0,1)) and
set to zero at inference; a transformer decoder maps [z, obs] + H query
tokens to an H-step action chunk. Temporal ensembling averages overlapping
chunk predictions at eval.

Usage:
    python -m maniskill_tpu.examples.baselines.act \
        --traj-path demos.h5 --env-id PickCube-v1 --epochs 500
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--traj-path", required=True)
    p.add_argument("--env-id", default=None)
    p.add_argument("--epochs", type=int, default=500)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--layers", type=int, default=3)
    p.add_argument("--latent-dim", type=int, default=32)
    p.add_argument("--horizon", type=int, default=8)
    p.add_argument("--kl-weight", type=float, default=10.0)
    p.add_argument("--eval-episodes", type=int, default=16)
    p.add_argument("--temporal-agg", action="store_true")
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

    H = args.horizon
    ds = ManiSkillTrajectoryDataset(args.traj_path)
    OBS, CHUNK = [], []
    for ep in range(len(ds.actions)):
        acts = np.asarray(ds.actions[ep], np.float32)
        batched = acts.ndim == 3
        obs = _flatten_obs(ds.obs[ep], 2 if batched else 1)
        cols = range(acts.shape[1]) if batched else [None]
        for b in cols:
            o = obs[:, b] if batched else obs
            a = acts[:, b] if batched else acts
            T = len(a)
            for t in range(T):
                OBS.append(o[t])
                CHUNK.append(np.stack([a[min(t + i, T - 1)] for i in range(H)]))
    X = np.stack(OBS)
    Y = np.stack(CHUNK)
    A = Y.shape[-1]
    print(f"dataset: {X.shape[0]} samples, obs {X.shape[1]}, chunk {H}x{A}")

    class Block(nn.Module):
        dim: int
        heads: int

        @nn.compact
        def __call__(self, x):
            y = nn.LayerNorm()(x)
            y = nn.MultiHeadDotProductAttention(num_heads=self.heads)(y, y)
            x = x + y
            y = nn.LayerNorm()(x)
            y = nn.Dense(self.dim * 4)(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim)(y)
            return x + y

    class ACT(nn.Module):
        @nn.compact
        def __call__(self, obs, chunk=None, zkey=None):
            D = args.dim
            # --- CVAE encoder (training only): z from (obs, chunk) ---
            if chunk is not None:
                toks = jnp.concatenate(
                    [
                        nn.Dense(D, name="enc_obs")(obs)[:, None],
                        nn.Dense(D, name="enc_act")(chunk),
                    ],
                    axis=1,
                )
                toks = toks + self.param(
                    "enc_pos", nn.initializers.normal(0.02), (1, 1 + H, D)
                )
                for i in range(args.layers):
                    toks = Block(D, args.heads, name=f"enc_{i}")(toks)
                stats = nn.Dense(2 * args.latent_dim, name="enc_z")(toks[:, 0])
                mu, logvar = stats[:, : args.latent_dim], stats[:, args.latent_dim :]
                z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(zkey, mu.shape)
            else:
                B = obs.shape[0]
                mu = logvar = jnp.zeros((B, args.latent_dim))
                z = jnp.zeros((B, args.latent_dim))

            # --- decoder: [z, obs, H queries] -> chunk ---
            q = self.param("query", nn.initializers.normal(0.02), (1, H, D))
            toks = jnp.concatenate(
                [
                    nn.Dense(D, name="dec_z")(z)[:, None],
                    nn.Dense(D, name="dec_obs")(obs)[:, None],
                    jnp.broadcast_to(q, (obs.shape[0], H, D)),
                ],
                axis=1,
            )
            for i in range(args.layers):
                toks = Block(D, args.heads, name=f"dec_{i}")(toks)
            out = nn.Dense(A, name="head")(toks[:, 2:])
            return out, mu, logvar

    model = ACT()
    key = jax.random.PRNGKey(args.seed)
    key, ik, zk = jax.random.split(key, 3)
    params = model.init(
        ik, jnp.zeros((1, X.shape[1])), jnp.zeros((1, H, A)), zk
    )
    tx = optax.adamw(args.lr, weight_decay=1e-4)
    opt_state = tx.init(params)

    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    n = X.shape[0]
    bs = min(args.batch_size, n)
    nb = max(1, n // bs)

    @jax.jit
    def epoch_step(params, opt_state, key):
        pk, key = jax.random.split(key)
        perm = jax.random.permutation(pk, n)

        def mb(carry, i):
            params, opt_state, key = carry
            key, zkey = jax.random.split(key)
            idx = jax.lax.dynamic_slice_in_dim(perm, i * bs, bs)
            obs, chunk = Xd[idx], Yd[idx]

            def loss_fn(p):
                pred, mu, logvar = model.apply(p, obs, chunk, zkey)
                l1 = jnp.mean(jnp.abs(pred - chunk))
                kl = -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))
                return l1 + args.kl_weight * kl, (l1, kl)

            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            up, opt_state = tx.update(g, opt_state, params)
            params = optax.apply_updates(params, up)
            return (params, opt_state, key), loss

        (params, opt_state, key), losses = jax.lax.scan(
            mb, (params, opt_state, key), jnp.arange(nb)
        )
        return params, opt_state, key, losses.mean()

    t0 = time.time()
    for e in range(args.epochs):
        params, opt_state, key, loss = epoch_step(params, opt_state, key)
        if e % max(1, args.epochs // 10) == 0 or e == args.epochs - 1:
            print(
                f"epoch {e}/{args.epochs} loss {float(loss):.5f} "
                f"({time.time()-t0:.1f}s)",
                flush=True,
            )

    if args.env_id:
        import maniskill_tpu.envs  # noqa: F401
        from maniskill_tpu.utils.registration import make

        env = make(args.env_id, num_envs=args.eval_episodes, obs_mode="state")
        obs, _ = env.reset(seed=123)
        infer = jax.jit(lambda p, o: model.apply(p, o)[0])
        success = np.zeros(args.eval_episodes, bool)
        if args.temporal_agg:
            # temporal ensembling: exponential-weighted average over all
            # chunks covering each timestep (act paper sec. 4)
            preds = np.zeros((50 + H, args.eval_episodes, H, A), np.float32)
            for t in range(50):
                chunk = np.asarray(infer(params, jnp.asarray(obs)))
                preds[t] = chunk
                acts, ws = [], []
                for i in range(min(t + 1, H)):
                    acts.append(preds[t - i][:, i])
                    ws.append(np.exp(-0.01 * i))
                act = np.average(np.stack(acts), axis=0, weights=ws)
                obs, rew, term, trunc, info = env.step(jnp.asarray(act))
                success |= np.asarray(info["success"])
        else:
            for t in range(0, 50, H):
                chunk = infer(params, jnp.asarray(obs))
                for k in range(H):
                    obs, rew, term, trunc, info = env.step(chunk[:, k])
                    success |= np.asarray(info["success"])
        print(f"eval success_once: {success.mean():.3f}")
        env.close()


if __name__ == "__main__":
    main()

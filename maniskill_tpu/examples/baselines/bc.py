"""Behavior-cloning baseline CLI (counterpart of examples/baselines/bc/bc.py).

Trains an MLP policy on state-action pairs from a RecordEpisode .h5
trajectory file (e.g. demos recorded from a trained PPO policy or replayed
reference trajectories), then evaluates it in the env.

Usage:
    python -m maniskill_tpu.examples.baselines.bc \
        --traj-path out/traj.h5 --env-id PushCube-v1 --epochs 50
"""
from __future__ import annotations

import argparse
import pickle
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--traj-path", required=True)
    p.add_argument("--env-id", default=None, help="eval env; default from traj meta")
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--hidden", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num-eval-envs", type=int, default=16)
    p.add_argument("--eval-steps", type=int, default=60)
    p.add_argument("--save-path", default="/tmp/bc_params.pkl")
    return p.parse_args(argv)


def _flatten_obs(o, lead_dims):
    """Flatten a (possibly nested dict) obs record, keeping `lead_dims`
    leading axes (time, and env for batched RecordEpisode layouts)."""
    if isinstance(o, dict):
        parts = [_flatten_obs(o[k], lead_dims) for k in sorted(o.keys())]
        return np.concatenate(parts, axis=-1)
    a = np.asarray(o, np.float32)
    return a.reshape(a.shape[:lead_dims] + (-1,))


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax

    from maniskill_tpu.trajectory.dataset import ManiSkillTrajectoryDataset

    ds = ManiSkillTrajectoryDataset(args.traj_path)
    # stack (obs_t, action_t) across all episodes; obs has T+1 entries per ep
    X, Y = [], []
    for ep in range(len(ds.actions)):
        acts = np.asarray(ds.actions[ep], np.float32)
        batched = acts.ndim == 3  # (T, B, A) RecordEpisode vectorized layout
        obs = _flatten_obs(ds.obs[ep], 2 if batched else 1)
        T = len(acts)
        o, a = obs[:T], acts
        if batched:
            o = o.reshape(-1, o.shape[-1])
            a = a.reshape(-1, a.shape[-1])
        X.append(o)
        Y.append(a)
    X = np.concatenate(X, 0)
    Y = np.concatenate(Y, 0)
    print(f"dataset: {X.shape[0]} transitions, obs {X.shape[1]}, act {Y.shape[1]}")

    class Policy(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(3):
                x = nn.relu(nn.Dense(args.hidden)(x))
            return nn.Dense(Y.shape[1])(x)

    model = Policy()
    key = jax.random.PRNGKey(args.seed)
    params = model.init(key, jnp.zeros((1, X.shape[1])))
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    n = X.shape[0]
    bs = min(args.batch_size, n)
    nb = max(1, n // bs)

    @jax.jit
    def epoch_step(params, opt_state, key):
        perm = jax.random.permutation(key, n)

        def mb(carry, i):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, i * bs, bs)
            x, y = Xd[idx], Yd[idx]

            def loss_fn(p):
                pred = model.apply(p, x)
                return jnp.mean((pred - y) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt_state = tx.update(g, opt_state)
            params = optax.apply_updates(params, up)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            mb, (params, opt_state), jnp.arange(nb)
        )
        return params, opt_state, jnp.mean(losses)

    t0 = time.time()
    for e in range(args.epochs):
        key, k = jax.random.split(key)
        params, opt_state, loss = epoch_step(params, opt_state, k)
        if e % max(1, args.epochs // 10) == 0 or e == args.epochs - 1:
            print(f"epoch {e}/{args.epochs} mse {float(loss):.5f} "
                  f"({time.time()-t0:.1f}s)", flush=True)

    with open(args.save_path, "wb") as f:
        pickle.dump(jax.device_get(params), f)
    print(f"saved policy params to {args.save_path}")

    # rollout eval
    env_id = args.env_id
    if env_id is None and ds.meta:
        env_id = ds.meta["env_info"]["env_id"]
    if env_id:
        import maniskill_tpu.envs  # noqa: F401
        from maniskill_tpu.utils.registration import make

        ek = dict(ds.meta["env_info"].get("env_kwargs", {})) if ds.meta else {}
        ek.pop("num_envs", None)
        ek.setdefault("obs_mode", "state")
        env = make(env_id, num_envs=args.num_eval_envs, **ek)
        obs, _ = env.reset(seed=args.seed + 1)
        succ = []
        for _ in range(args.eval_steps):
            act = model.apply(params, obs)
            obs, rew, term, trunc, info = env.step(act)
            succ.append(np.asarray(info.get("success", term)))
        print("eval success(any):", np.stack(succ).any(axis=0).mean())
        env.close()


if __name__ == "__main__":
    main()

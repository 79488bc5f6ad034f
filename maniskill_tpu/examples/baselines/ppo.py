"""PPO baseline CLI (counterpart of examples/baselines/ppo/ppo.py).

CleanRL-style single-file flow, but the rollout + update is ONE jitted
program (physics, policy, GAE, minibatch epochs all fused; shardable over a
device mesh on the env axis).

Usage:
    python -m maniskill_tpu.examples.baselines.ppo --env-id PushCube-v1 \
        --num-envs 1024 --total-steps 2000000
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--num-envs", type=int, default=1024)
    p.add_argument("--rollout-steps", type=int, default=16)
    p.add_argument("--total-steps", type=int, default=2_000_000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--gae-lambda", type=float, default=0.9)
    p.add_argument("--update-epochs", type=int, default=4)
    p.add_argument("--num-minibatches", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=10)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.parallel.train import PPOConfig, make_train_step

    env = make(args.env_id, num_envs=args.num_envs, obs_mode="state")
    base = env.unwrapped
    obs, _ = env.reset(seed=args.seed)
    obs_dim = obs.shape[-1]

    config = PPOConfig(
        rollout_steps=args.rollout_steps,
        gamma=args.gamma,
        gae_lambda=args.gae_lambda,
        lr=args.lr,
        update_epochs=args.update_epochs,
        num_minibatches=args.num_minibatches,
    )
    model, init_state, train_step = make_train_step(env, config)
    key = jax.random.PRNGKey(args.seed)
    steps_per_iter_ = args.num_envs * args.rollout_steps
    iters_ = max(1, args.total_steps // steps_per_iter_)
    params, opt_state, tx = init_state(key, obs_dim, total_updates=iters_)

    step_fn = jax.jit(lambda p, o, d, ob, el, k: train_step(p, o, tx, d, ob, el, k))

    data = base.scene.data
    elapsed = jnp.zeros(args.num_envs, jnp.int32)

    steps_per_iter = args.num_envs * args.rollout_steps
    iters = max(1, args.total_steps // steps_per_iter)
    t0 = time.time()
    for it in range(iters):
        params, opt_state, data, obs, elapsed, key, metrics = step_fn(
            params, opt_state, data, obs, elapsed, key
        )
        if it % args.eval_every == 0 or it == iters - 1:
            jax.block_until_ready(metrics["loss"])
            sps = steps_per_iter * (it + 1) / (time.time() - t0)
            extra = " ".join(
                f"{k}={float(v):.3g}" for k, v in metrics.items()
                if k not in ("loss", "mean_reward")
            )
            print(
                f"iter {it}/{iters} loss {float(metrics['loss']):.4f} "
                f"mean_reward {float(metrics['mean_reward']):.4f} "
                f"env_steps/s {sps:,.0f} {extra}",
                flush=True,
            )
    # final greedy evaluation
    base.scene.bind(data)
    obs_eval, _ = env.reset(seed=123)
    successes = jnp.zeros(args.num_envs, bool)
    for _ in range(50):
        mean, _, _ = model.apply(params, obs_eval)
        obs_eval, rew, term, trunc, info = env.step(mean)
        successes = successes | info["success"]
    rate = float(successes.mean())
    print(f"final eval success_once rate: {rate:.3f}", flush=True)
    return rate


if __name__ == "__main__":
    main()

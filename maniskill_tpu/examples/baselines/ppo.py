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
    p.add_argument("--ignore-terminations", action="store_true")
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
        ignore_terminations=args.ignore_terminations,
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
    # save checkpoint
    import pickle

    with open("/tmp/ppo_params.pkl", "wb") as f:
        pickle.dump(jax.device_get(params), f)

    # final evaluation: greedy and stochastic
    def evaluate(stochastic, seed):
        base.scene.bind(data)
        obs_eval, _ = env.reset(seed=seed)
        successes = jnp.zeros(args.num_envs, bool)
        ekey = jax.random.PRNGKey(seed)
        for _ in range(50):
            mean, log_std, _ = model.apply(params, obs_eval)
            if stochastic:
                ekey, sk = jax.random.split(ekey)
                act = mean + jnp.exp(log_std) * jax.random.normal(sk, mean.shape)
            else:
                act = mean
            obs_eval, rew, term, trunc, info = env.step(act)
            successes = successes | info["success"]
        # diagnostics: final cube-goal distance distribution
        dist = jnp.linalg.norm(
            base.obj.pose.p[:, :2] - base.goal_region.pose.p[:, :2], axis=1
        ) if hasattr(base, "obj") else jnp.zeros(args.num_envs)
        return float(successes.mean()), np.percentile(np.asarray(dist), [10, 50, 90])

    g_rate, g_d = evaluate(False, 123)
    s_rate, s_d = evaluate(True, 124)
    print(f"final eval greedy success_once: {g_rate:.3f} dist p10/50/90 {np.round(g_d,3)}", flush=True)
    print(f"final eval stochastic success_once: {s_rate:.3f} dist p10/50/90 {np.round(s_d,3)}", flush=True)
    return g_rate


if __name__ == "__main__":
    main()

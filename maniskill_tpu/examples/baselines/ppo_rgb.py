"""Visual PPO baseline CLI (counterpart of examples/baselines/ppo/ppo_rgb.py).

Same fused single-program flow as the state PPO baseline, but the env runs
with a visual obs mode: the tiled rasterizer renders straight into HBM inside
the rollout jit and the NatureCNN encoder (bfloat16 convs) consumes the
frames with zero copies — there is no sim->render->learner transfer anywhere.

Usage:
    python -m maniskill_tpu.examples.baselines.ppo_rgb --env-id PickCube-v1 \
        --num-envs 256 --total-steps 10000000
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PickCube-v1")
    p.add_argument("--obs-mode", default="rgb", help="rgb | rgbd | rgb+depth")
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--rollout-steps", type=int, default=8)
    p.add_argument("--total-steps", type=int, default=10_000_000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--gae-lambda", type=float, default=0.9)
    p.add_argument("--update-epochs", type=int, default=4)
    p.add_argument("--num-minibatches", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ignore-terminations", action="store_true")
    p.add_argument("--eval-every", type=int, default=10)
    p.add_argument("--checkpoint", default="/tmp/ppo_rgb_params.pkl")
    p.add_argument("--save-every", type=int, default=200, help="iters between checkpoint saves")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.parallel.train import (
        PPOConfig,
        make_obs_transform,
        make_train_step,
    )

    env = make(args.env_id, num_envs=args.num_envs, obs_mode=args.obs_mode)
    base = env.unwrapped
    raw_obs, _ = env.reset(seed=args.seed)

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
    obs_tf = make_obs_transform(base)
    obs = obs_tf(raw_obs)
    key = jax.random.PRNGKey(args.seed)
    steps_per_iter = args.num_envs * args.rollout_steps
    iters = max(1, args.total_steps // steps_per_iter)
    params, opt_state, tx = init_state(key, obs, total_updates=iters)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    print(
        f"obs: {jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), obs)} "
        f"params: {n_params:,}",
        flush=True,
    )

    step_fn = jax.jit(lambda p, o, d, ob, el, k: train_step(p, o, tx, d, ob, el, k))

    data = base.scene.data
    elapsed = jnp.zeros(args.num_envs, jnp.int32)

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
        if args.save_every and it and it % args.save_every == 0:
            import pickle

            with open(args.checkpoint, "wb") as f:
                pickle.dump(jax.device_get(params), f)
    import pickle

    with open(args.checkpoint, "wb") as f:
        pickle.dump(jax.device_get(params), f)

    # final evaluation (greedy), success-once over one horizon
    def evaluate(seed):
        base.scene.bind(data)
        raw, _ = env.reset(seed=seed)
        obs_eval = obs_tf(raw)
        successes = jnp.zeros(args.num_envs, bool)

        @jax.jit
        def policy(params, o):
            mean, _, _ = model.apply(params, o)
            return mean

        for _ in range(50):
            act = policy(params, obs_eval)
            raw, rew, term, trunc, info = env.step(act)
            obs_eval = obs_tf(raw)
            successes = successes | info["success"]
        return float(successes.mean())

    rate = evaluate(123)
    print(f"final eval greedy success_once: {rate:.3f}", flush=True)
    return rate


if __name__ == "__main__":
    main()

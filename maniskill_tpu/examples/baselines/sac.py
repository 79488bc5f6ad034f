"""SAC baseline CLI (counterpart of examples/baselines/sac/sac.py).

Off-policy twin: device-resident replay ring + fused collect/update jit
(see maniskill_tpu/parallel/sac.py).

Usage:
    python -m maniskill_tpu.examples.baselines.sac --env-id PushCube-v1 \
        --num-envs 128 --total-steps 1000000
"""
from __future__ import annotations

import argparse
import pickle
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--num-envs", type=int, default=128)
    p.add_argument("--rollout-steps", type=int, default=4)
    p.add_argument("--buffer-steps", type=int, default=512)
    p.add_argument("--total-steps", type=int, default=1_000_000)
    p.add_argument("--batch-size", type=int, default=4096)
    p.add_argument("--utd", type=int, default=4)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--warmup-steps", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--ignore-terminations", action="store_true")
    p.add_argument("--save-path", default="/tmp/sac_params.pkl")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.parallel.sac import SACConfig, make_sac_step

    env = make(args.env_id, num_envs=args.num_envs, obs_mode="state")
    base = env.unwrapped
    obs, _ = env.reset(seed=args.seed)
    obs_dim = obs.shape[-1]

    config = SACConfig(
        rollout_steps=args.rollout_steps,
        buffer_steps=args.buffer_steps,
        batch_size=args.batch_size,
        utd=args.utd,
        gamma=args.gamma,
        lr=args.lr,
        ignore_terminations=args.ignore_terminations,
    )
    actor, qnet, init_state, train_step = make_sac_step(env, config)
    train_step = jax.jit(train_step)

    key = jax.random.PRNGKey(args.seed)
    key, ikey = jax.random.split(key)
    state = init_state(ikey, obs_dim)
    data = base.scene.data
    elapsed = jnp.zeros((args.num_envs,), jnp.int32)

    steps_per_iter = args.num_envs * args.rollout_steps
    iters = args.total_steps // steps_per_iter
    t0 = time.time()
    env_steps = 0
    for it in range(iters):
        learn = jnp.asarray(it >= args.warmup_steps)
        state, data, obs, elapsed, key, metrics = train_step(
            state, data, obs, elapsed, key, learn
        )
        env_steps += steps_per_iter
        if it % args.eval_every == 0 or it == iters - 1:
            metrics = jax.tree.map(float, jax.device_get(metrics))
            sps = env_steps / (time.time() - t0)
            print(
                f"iter {it}/{iters} q_loss {metrics['q_loss']:.4f} "
                f"actor_loss {metrics['actor_loss']:.4f} "
                f"alpha {metrics['alpha']:.3f} env_steps/s {sps:,.0f}",
                flush=True,
            )

    with open(args.save_path, "wb") as f:
        pickle.dump(jax.device_get(state.actor_params), f)
    print(f"saved actor params to {args.save_path}")

    # greedy eval (re-bind the real carried data: the training jit traced
    # through the env's functional core, leaving the scene on a tracer)
    base.scene.bind(data)
    obs, _ = env.reset(seed=args.seed + 1000)
    successes, rews = [], []
    for _ in range(60):
        mean, _ = actor.apply(state.actor_params, obs)
        obs, rew, term, trunc, info = env.step(jnp.tanh(mean))
        successes.append(np.asarray(info.get("success", term)))
        rews.append(np.asarray(rew))
    print(
        f"final eval success(any): {np.stack(successes).any(axis=0).mean():.3f} "
        f"mean_reward: {np.stack(rews).mean():.3f}"
    )
    env.close()


if __name__ == "__main__":
    main()

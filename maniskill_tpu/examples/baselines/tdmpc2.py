"""TD-MPC2 baseline CLI (counterpart of examples/baselines/tdmpc2/train.py).

Model-based RL: latent world model + MPPI planner, fully fused on device
(see maniskill_tpu/parallel/tdmpc2.py).

Usage:
    python -m maniskill_tpu.examples.baselines.tdmpc2 --env-id PushCube-v1 \
        --num-envs 32 --total-steps 200000
"""
from __future__ import annotations

import argparse
import pickle
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--num-envs", type=int, default=32)
    p.add_argument("--rollout-steps", type=int, default=4)
    p.add_argument("--buffer-steps", type=int, default=1000)
    p.add_argument("--total-steps", type=int, default=200_000)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--num-updates", type=int, default=2)
    p.add_argument("--horizon", type=int, default=3)
    p.add_argument("--num-samples", type=int, default=512)
    p.add_argument("--no-mpc", action="store_true",
                   help="act with the policy prior instead of MPPI")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--warmup-steps", type=int, default=20)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--save-path", default="/tmp/tdmpc2_params.pkl")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.utils.gym_utils import find_max_episode_steps_value
    from maniskill_tpu.parallel.tdmpc2 import TDMPC2Config, make_tdmpc2_step

    env = make(args.env_id, num_envs=args.num_envs, obs_mode="state")
    base = env.unwrapped
    obs, _ = env.reset(seed=args.seed)
    obs_dim = obs.shape[-1]

    ep_len = find_max_episode_steps_value(env) or 50
    buffer_steps = (max(args.buffer_steps, ep_len) // ep_len) * ep_len
    config = TDMPC2Config(
        mpc=not args.no_mpc,
        horizon=args.horizon,
        num_samples=args.num_samples,
        rollout_steps=args.rollout_steps,
        buffer_steps=buffer_steps,
        batch_size=args.batch_size,
        num_updates=args.num_updates,
    )
    init_state, train_step, act = make_tdmpc2_step(env, config)
    train_step = jax.jit(train_step)
    act = jax.jit(act, static_argnames=("eval_mode",))

    key = jax.random.PRNGKey(args.seed)
    key, ikey = jax.random.split(key)
    state = init_state(ikey, obs_dim)
    data = base.scene.data
    elapsed = jnp.zeros((args.num_envs,), jnp.int32)

    steps_per_iter = args.num_envs * args.rollout_steps
    iters = args.total_steps // steps_per_iter
    # learning starts once at least one full episode per ring row exists
    warmup = max(args.warmup_steps, ep_len // args.rollout_steps)
    t0 = time.time()
    env_steps = 0
    for it in range(iters):
        learn = jnp.asarray(it >= warmup)
        state, data, obs, elapsed, key, metrics = train_step(
            state, data, obs, elapsed, key, learn
        )
        env_steps += steps_per_iter
        if it % args.eval_every == 0 or it == iters - 1:
            metrics = jax.tree.map(float, jax.device_get(metrics))
            sps = env_steps / (time.time() - t0)
            print(
                f"iter {it}/{iters} "
                f"consistency {metrics['consistency_loss']:.4f} "
                f"reward {metrics['reward_loss']:.4f} "
                f"value {metrics['value_loss']:.4f} "
                f"pi {metrics['pi_loss']:.4f} "
                f"q_scale {metrics['q_scale']:.2f} env_steps/s {sps:,.0f}",
                flush=True,
            )

    with open(args.save_path, "wb") as f:
        pickle.dump(
            jax.device_get(
                dict(model=state.model_params, pi=state.pi_params)
            ),
            f,
        )
    print(f"saved world model + policy to {args.save_path}")

    # greedy eval with the planner
    base.scene.bind(data)
    obs, _ = env.reset(seed=args.seed + 1000)
    successes, rews = [], []
    elapsed_ev = jnp.zeros((args.num_envs,), jnp.int32)
    for t in range(ep_len):
        key, akey = jax.random.split(key)
        a, state = act(state, obs, elapsed_ev == 0, akey, eval_mode=True)
        obs, rew, term, trunc, info = env.step(a)
        elapsed_ev = elapsed_ev + 1
        successes.append(np.asarray(info.get("success", term)))
        rews.append(np.asarray(rew))
    print(
        f"final eval success(any): {np.stack(successes).any(axis=0).mean():.3f} "
        f"mean_reward: {np.stack(rews).mean():.3f}"
    )
    env.close()


if __name__ == "__main__":
    main()

"""RFCL baseline CLI (counterpart of examples/baselines/rfcl/train.py).

Reverse-forward curriculum SAC from a handful of demos
(see maniskill_tpu/parallel/rfcl.py).

Usage:
    python -m maniskill_tpu.examples.baselines.rfcl --env-id PickCube-v1 \
        --demos demos/pickcube.h5 --num-demos 5 --num-envs 64
"""
from __future__ import annotations

import argparse
import pickle
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PickCube-v1")
    p.add_argument("--demos", required=True, help="RecordEpisode .h5 file")
    p.add_argument("--num-demos", type=int, default=None)
    p.add_argument("--num-envs", type=int, default=64)
    p.add_argument("--rollout-steps", type=int, default=4)
    p.add_argument("--buffer-steps", type=int, default=512)
    p.add_argument("--total-steps", type=int, default=1_000_000)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--utd", type=int, default=4)
    p.add_argument("--gamma", type=float, default=0.95)
    p.add_argument("--reverse-step-size", type=int, default=4)
    p.add_argument("--success-threshold", type=float, default=0.75)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--warmup-steps", type=int, default=40)
    p.add_argument("--eval-every", type=int, default=200)
    p.add_argument("--save-path", default="/tmp/rfcl_params.pkl")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.parallel.sac import SACConfig
    from maniskill_tpu.parallel.rfcl import (
        RFCLConfig, load_demo_states, make_rfcl_step,
    )

    demo_states, demo_lens, demos = load_demo_states(args.demos, args.num_demos)
    print(f"loaded {len(demo_lens)} demos, lengths {np.asarray(demo_lens).tolist()}")

    env = make(args.env_id, num_envs=args.num_envs, obs_mode="state")
    base = env.unwrapped
    obs, _ = env.reset(seed=args.seed)
    obs_dim = obs.shape[-1]
    if demos is not None and demos["obs"].shape[-1] != obs_dim:
        print("demo obs dim mismatch -> replay mixing disabled")
        demos = None

    config = RFCLConfig(
        sac=SACConfig(
            rollout_steps=args.rollout_steps,
            buffer_steps=args.buffer_steps,
            batch_size=args.batch_size,
            utd=args.utd,
            gamma=args.gamma,
        ),
        reverse_step_size=args.reverse_step_size,
        success_threshold=args.success_threshold,
    )
    actor, init_state, train_step = make_rfcl_step(
        env, demo_states, demo_lens, config, demos=demos
    )
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
                f"mean_k {metrics['mean_k']:.1f} "
                f"reverse_done {metrics['reverse_done']:.0f} "
                f"env_steps/s {sps:,.0f}",
                flush=True,
            )

    with open(args.save_path, "wb") as f:
        pickle.dump(jax.device_get(state.sac.actor_params), f)
    print(f"saved actor params to {args.save_path}")

    # greedy eval from standard resets (the forward-phase criterion)
    base.scene.bind(data)
    obs, _ = env.reset(seed=args.seed + 1000)
    successes = []
    for _ in range(60):
        mean, _ = actor.apply(state.sac.actor_params, obs)
        obs, rew, term, trunc, info = env.step(jnp.tanh(mean))
        successes.append(np.asarray(info.get("success", term)))
    print(f"final eval success(any): {np.stack(successes).any(axis=0).mean():.3f}")
    env.close()


if __name__ == "__main__":
    main()

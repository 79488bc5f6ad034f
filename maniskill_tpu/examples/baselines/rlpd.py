"""RLPD baseline (counterpart of examples/baselines/rlpd in the reference,
after Ball et al. 2023 "Efficient Online RL with Offline Data").

SAC with 50/50 sampling between the online replay ring and a demo buffer
loaded from a RecordEpisode h5 (recorded with rewards). The entire
collect+update step is the fused SAC jit (parallel/sac.py) with demo
mixing enabled.

Usage:
    python -m maniskill_tpu.examples.baselines.rlpd --env-id PickCube-v1 \
        --traj-path demos.h5 --num-envs 256 --total-steps 2000000
"""
from __future__ import annotations

import argparse
import pickle
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--env-id", default="PushCube-v1")
    p.add_argument("--traj-path", required=True)
    p.add_argument("--num-envs", type=int, default=256)
    p.add_argument("--rollout-steps", type=int, default=4)
    p.add_argument("--buffer-steps", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--utd", type=int, default=4)
    p.add_argument("--gamma", type=float, default=0.9)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--total-steps", type=int, default=1_000_000)
    p.add_argument("--warmup-steps", type=int, default=20)
    p.add_argument("--eval-every", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ignore-terminations", action="store_true")
    p.add_argument("--save-path", default="/tmp/rlpd_params.pkl")
    return p.parse_args(argv)


def _flatten_obs(o, batch_dims):
    if isinstance(o, dict):
        parts = [_flatten_obs(v, batch_dims) for _, v in sorted(o.items())]
        return np.concatenate(parts, axis=-1)
    o = np.asarray(o, np.float32)
    return o.reshape(o.shape[:batch_dims] + (-1,))


def load_demo_transitions(traj_path: str):
    """(obs, act, rew, next_obs, term) flat transition arrays from h5."""
    from maniskill_tpu.trajectory.dataset import ManiSkillTrajectoryDataset

    ds = ManiSkillTrajectoryDataset(traj_path)
    O, A, R, NO, T = [], [], [], [], []
    for ep in range(len(ds.actions)):
        acts = np.asarray(ds.actions[ep], np.float32)
        batched = acts.ndim == 3
        obs = _flatten_obs(ds.obs[ep], 2 if batched else 1)
        rew = (
            np.asarray(ds.rewards[ep], np.float32)
            if getattr(ds, "rewards", None) is not None and ds.rewards[ep] is not None
            else np.zeros(acts.shape[:-1], np.float32)
        )
        n = len(acts)
        term = np.zeros(acts.shape[:-1], bool)
        term[-1] = True
        o, no = obs[:n], obs[1 : n + 1]
        if batched:
            o = o.reshape(-1, o.shape[-1]); no = no.reshape(-1, no.shape[-1])
            a = acts.reshape(-1, acts.shape[-1])
            r, t = rew.reshape(-1), term.reshape(-1)
        else:
            a, r, t = acts, rew, term
        O.append(o), A.append(a), R.append(r), NO.append(no), T.append(t)
    return dict(
        obs=np.concatenate(O),
        act=np.concatenate(A),
        rew=np.concatenate(R),
        next_obs=np.concatenate(NO),
        term=np.concatenate(T),
    )


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.parallel.sac import SACConfig, make_sac_step

    demos_np = load_demo_transitions(args.traj_path)
    print(f"demo buffer: {demos_np['obs'].shape[0]} transitions")
    demos = {k: jnp.asarray(v) for k, v in demos_np.items()}

    env = make(args.env_id, num_envs=args.num_envs, obs_mode="state")
    base = env.unwrapped
    obs, _ = env.reset(seed=args.seed)
    obs_dim = obs.shape[-1]
    assert demos_np["obs"].shape[-1] == obs_dim, (
        f"demo obs dim {demos_np['obs'].shape[-1]} != env obs dim {obs_dim}"
    )

    config = SACConfig(
        rollout_steps=args.rollout_steps,
        buffer_steps=args.buffer_steps,
        batch_size=args.batch_size,
        utd=args.utd,
        gamma=args.gamma,
        lr=args.lr,
        ignore_terminations=args.ignore_terminations,
    )
    actor, qnet, init_state, train_step = make_sac_step(env, config, demos=demos)
    train_step = jax.jit(train_step)

    key = jax.random.PRNGKey(args.seed)
    key, ikey = jax.random.split(key)
    state = init_state(ikey, obs_dim)
    data = base.scene.data
    elapsed = jnp.zeros((args.num_envs,), jnp.int32)

    steps_per_iter = args.num_envs * args.rollout_steps
    iters = args.total_steps // steps_per_iter
    t0 = time.time()
    for it in range(iters):
        learn = jnp.asarray(it >= args.warmup_steps)
        state, data, obs, elapsed, key, metrics = train_step(
            state, data, obs, elapsed, key, learn
        )
        if it % args.eval_every == 0 or it == iters - 1:
            metrics = jax.tree.map(float, jax.device_get(metrics))
            sps = steps_per_iter * (it + 1) / (time.time() - t0)
            print(
                f"iter {it}/{iters} q_loss {metrics['q_loss']:.4f} "
                f"actor_loss {metrics['actor_loss']:.4f} env_steps/s {sps:,.0f}",
                flush=True,
            )

    with open(args.save_path, "wb") as f:
        pickle.dump(jax.device_get(state.actor_params), f)

    base.scene.bind(data)
    obs, _ = env.reset(seed=args.seed + 1000)
    successes = []
    for _ in range(60):
        mean, _ = actor.apply(state.actor_params, obs)
        obs, rew, term, trunc, info = env.step(jnp.tanh(mean))
        successes.append(np.asarray(info.get("success", term)))
    print(f"final eval success(any): {np.stack(successes).any(axis=0).mean():.3f}")
    env.close()


if __name__ == "__main__":
    main()

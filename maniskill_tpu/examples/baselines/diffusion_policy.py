"""Diffusion Policy baseline (counterpart of
examples/baselines/diffusion_policy in the reference, after Chi et al.
2023), pure JAX/flax.

A conditional DDPM over action chunks: given an observation-history
window, the model denoises a horizon of future actions; at eval the first
``act_steps`` denoised actions execute before re-planning. The denoiser is
the reference's ConditionalUnet1D (Conv1D residual blocks with FiLM
conditioning on the observation + sinusoidal timestep embedding, down/up
path with skips — examples/baselines/diffusion_policy/train.py's
ConditionalUnet1D analog); pass ``--denoiser mlp`` for a lighter MLP
variant. Demos recorded with visual observations train a NatureCNN frame
encoder end-to-end through the diffusion loss (the reference's PlainConv
visual encoder analog in train_rgbd.py).

Usage:
    python -m maniskill_tpu.examples.baselines.diffusion_policy \
        --traj-path out/demos.h5 --env-id PickCube-v1 --epochs 200

Demo control mode matters (as in the reference): absolute pd_joint_pos
motion-planning demos make the script phase unobservable from state and
closed-loop IL stalls at phase boundaries. Convert demos to a delta mode
first (reference baselines do the same):
    python -m maniskill_tpu.trajectory.replay_trajectory \
        --traj-path demos/PickCube-v1/mp_PickCube-v1.h5 \
        -c pd_joint_delta_pos --save-traj
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
    p.add_argument("--denoiser", choices=["unet", "mlp"], default="unet")
    p.add_argument("--unet-dims", type=int, nargs="+", default=[64, 128, 256])
    p.add_argument("--obs-mode", default="state",
                   help="obs mode for the eval env; use the mode the demos "
                        "were recorded with (e.g. rgb)")
    return p.parse_args(argv)


def _is_image(a, batch_dims):
    a = np.asarray(a)
    return a.ndim == batch_dims + 3 and a.dtype == np.uint8


def _split_obs(o, batch_dims):
    """Separate an obs tree into (flat state vector, list of image arrays)."""
    if isinstance(o, dict):
        vec_parts, imgs = [], []
        for _, v in sorted(o.items()):
            vec, im = _split_obs(v, batch_dims)
            if vec is not None:
                vec_parts.append(vec)
            imgs.extend(im)
        vec = np.concatenate(vec_parts, axis=-1) if vec_parts else None
        return vec, imgs
    if _is_image(o, batch_dims):
        return None, [np.asarray(o)]
    o = np.asarray(o, np.float32)
    return o.reshape(o.shape[:batch_dims] + (-1,)), []


def _windows(obs, acts, W, H, img=None):
    """obs (T+1, D), acts (T, A), img (T+1, h, w, c) -> per-step windows:
    (N, W*D), chunks (N, H, A), image windows (N, W, h, w, c)."""
    T = len(acts)
    OBS, CH, IM = [], [], []
    for t in range(T):
        idxs = [max(0, t - i) for i in range(W - 1, -1, -1)]
        OBS.append(np.concatenate([obs[i] for i in idxs], -1))
        CH.append(np.stack([acts[min(t + i, T - 1)] for i in range(H)]))
        if img is not None:
            IM.append(np.stack([img[i] for i in idxs]))
    return (np.stack(OBS), np.stack(CH),
            np.stack(IM) if img is not None else None)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax

    from maniskill_tpu.trajectory.dataset import ManiSkillTrajectoryDataset

    ds = ManiSkillTrajectoryDataset(args.traj_path)
    H, W = args.horizon, args.obs_window

    OBS, CHUNK, IMGS = [], [], []
    for ep in range(len(ds.actions)):
        acts = np.asarray(ds.actions[ep], np.float32)
        batched = acts.ndim == 3
        bd = 2 if batched else 1
        vec, imgs = _split_obs(ds.obs[ep], bd)
        img = np.concatenate(imgs, axis=-1) if imgs else None  # cams -> channels
        if vec is None:
            vec = np.zeros(acts.shape[:bd] + (0,), np.float32)
        if batched:  # (T, B, ...) -> iterate env columns
            for b in range(acts.shape[1]):
                o_, c_, i_ = _windows(
                    vec[:, b], acts[:, b], W, H,
                    img[:, b] if img is not None else None,
                )
                OBS.append(o_), CHUNK.append(c_), IMGS.append(i_)
        else:
            o_, c_, i_ = _windows(vec, acts, W, H, img)
            OBS.append(o_), CHUNK.append(c_), IMGS.append(i_)
    X = np.concatenate(OBS, 0)  # (N, W*obs_dim)
    Y = np.concatenate(CHUNK, 0)  # (N, H, act_dim)
    # normalize actions to [-1, 1] with dataset stats (the reference's
    # LinearNormalizer): unnormalized joint-space demo actions otherwise
    # fall outside the DDPM's clipped sample range
    a_min = Y.min(axis=(0, 1))
    a_max = Y.max(axis=(0, 1))
    a_scale = np.maximum(a_max - a_min, 1e-4)
    Y = 2.0 * (Y - a_min) / a_scale - 1.0
    XI = (np.concatenate([i for i in IMGS if i is not None], 0)
          if IMGS and IMGS[0] is not None else None)  # (N, W, h, w, c) u8
    A = Y.shape[-1]
    print(
        f"dataset: {X.shape[0]} windows, state {X.shape[1]}, chunk {H}x{A}"
        + (f", images {XI.shape[1:]}" if XI is not None else "")
    )

    T_DIFF = args.diffusion_steps
    betas = np.linspace(1e-4, 0.02, T_DIFF, dtype=np.float32)
    alphas = 1.0 - betas
    alpha_bar = np.cumprod(alphas)
    ab = jnp.asarray(alpha_bar)

    def mish(x):
        return x * jnp.tanh(jax.nn.softplus(x))

    class FrameEncoder(nn.Module):
        """NatureCNN over each window frame, outputs (B, W*256)
        (reference train_rgbd.py PlainConv analog)."""

        @nn.compact
        def __call__(self, img):
            B, Wn = img.shape[:2]
            x = img.reshape((B * Wn,) + img.shape[2:]).astype(jnp.float32) / 255.0
            x = nn.relu(nn.Conv(32, (8, 8), strides=4)(x))
            x = nn.relu(nn.Conv(64, (4, 4), strides=2)(x))
            x = nn.relu(nn.Conv(64, (3, 3), strides=1)(x))
            x = x.reshape(B * Wn, -1)
            x = nn.relu(nn.Dense(256)(x))
            return x.reshape(B, Wn * 256)

    class ResBlock1D(nn.Module):
        """Conv1D residual block with FiLM conditioning (reference
        ConditionalResidualBlock1D)."""

        ch: int

        @nn.compact
        def __call__(self, x, cond):
            h = nn.Conv(self.ch, (5,), padding="SAME")(x)
            h = nn.GroupNorm(num_groups=8)(h)
            h = mish(h)
            film = nn.Dense(2 * self.ch)(mish(cond))
            scale, shift = jnp.split(film[:, None, :], 2, axis=-1)
            h = h * (1 + scale) + shift
            h = nn.Conv(self.ch, (5,), padding="SAME")(h)
            h = nn.GroupNorm(num_groups=8)(h)
            h = mish(h)
            res = nn.Conv(self.ch, (1,))(x) if x.shape[-1] != self.ch else x
            return h + res

    class ConditionalUnet1D(nn.Module):
        dims: tuple

        @nn.compact
        def __call__(self, x, cond):
            """x (B, T, A): denoise along the chunk-time axis."""
            skips = []
            for i, d in enumerate(self.dims[:-1]):
                x = ResBlock1D(d)(x, cond)
                x = ResBlock1D(d)(x, cond)
                skips.append(x)
                x = nn.Conv(d, (3,), strides=2, padding="SAME")(x)  # down
            x = ResBlock1D(self.dims[-1])(x, cond)
            x = ResBlock1D(self.dims[-1])(x, cond)
            for d, skip in zip(reversed(self.dims[:-1]), reversed(skips)):
                x = nn.ConvTranspose(d, (4,), strides=(2,), padding="SAME")(x)
                x = x[:, : skip.shape[1]]  # crop to skip length
                x = jnp.concatenate([x, skip], axis=-1)
                x = ResBlock1D(d)(x, cond)
                x = ResBlock1D(d)(x, cond)
            return nn.Conv(A, (5,), padding="SAME")(x)

    class Denoiser(nn.Module):
        kind: str

        @nn.compact
        def __call__(self, noisy_chunk, obs, imgs, t):
            half = 64
            freqs = jnp.exp(-np.log(1e4) * jnp.arange(half) / half)
            emb = t[:, None] * freqs[None]
            temb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
            temb = nn.Dense(128)(mish(nn.Dense(128)(temb)))
            feats = [obs, temb]
            if imgs is not None:
                feats.insert(0, FrameEncoder()(imgs))
            cond = jnp.concatenate(feats, -1)
            if self.kind == "mlp":
                x = jnp.concatenate(
                    [noisy_chunk.reshape(noisy_chunk.shape[0], -1), cond], -1
                )
                for _ in range(4):
                    x = nn.gelu(nn.Dense(args.hidden)(x))
                return nn.Dense(H * A)(x).reshape(-1, H, A)
            return ConditionalUnet1D(tuple(args.unet_dims))(noisy_chunk, cond)

    model = Denoiser(args.denoiser)
    key = jax.random.PRNGKey(args.seed)
    dummy_img = (jnp.zeros((1,) + XI.shape[1:], jnp.uint8)
                 if XI is not None else None)
    params = model.init(
        key, jnp.zeros((1, H, A)), jnp.zeros((1, X.shape[1])), dummy_img,
        jnp.zeros((1,)),
    )
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"denoiser={args.denoiser} params={n_params:,}")
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    XId = jnp.asarray(XI) if XI is not None else None
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
            imgs = XId[idx] if XId is not None else None
            t = jax.random.randint(tk, (bs,), 0, T_DIFF)
            noise = jax.random.normal(nk, chunk.shape)
            abt = ab[t][:, None, None]
            noisy = jnp.sqrt(abt) * chunk + jnp.sqrt(1 - abt) * noise

            def loss_fn(p):
                eps = model.apply(p, noisy, obs, imgs, t.astype(jnp.float32))
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
    def sample_chunk(params, obs, imgs, key):
        """DDPM ancestral sampling of one action chunk per env."""
        B = obs.shape[0]
        x = jax.random.normal(key, (B, H, A))

        def body(t, carry):
            x, key = carry
            ti = T_DIFF - 1 - t
            key, nk = jax.random.split(key)
            eps = model.apply(
                params, x, obs, imgs, jnp.full((B,), ti, jnp.float32)
            )
            a_t, ab_t = jnp.asarray(alphas)[ti], ab[ti]
            x = (x - (1 - a_t) / jnp.sqrt(1 - ab_t) * eps) / jnp.sqrt(a_t)
            noise = jax.random.normal(nk, x.shape)
            x = x + jnp.where(ti > 0, jnp.sqrt(jnp.asarray(betas)[ti]), 0.0) * noise
            return (x, key)

        x, _ = jax.lax.fori_loop(0, T_DIFF, body, (x, key))
        return jnp.clip(x, -1.0, 1.0)

    if args.env_id:
        import maniskill_tpu.envs  # noqa: F401
        from maniskill_tpu.utils import common
        from maniskill_tpu.utils.registration import make

        env = make(args.env_id, num_envs=args.eval_episodes,
                   obs_mode=args.obs_mode)
        obs, _ = env.reset(seed=123)

        def parts(obs):
            o = common.to_numpy(obs)
            vec, imgs = _split_obs(o, 1)
            if vec is None:
                vec = np.zeros((args.eval_episodes, 0), np.float32)
            img = np.concatenate(imgs, axis=-1) if imgs else None
            return vec, img

        v0, i0 = parts(obs)
        hist = [(v0, i0)] * W
        success = np.zeros(args.eval_episodes, bool)
        for t in range(0, 50, args.act_steps):
            window = jnp.asarray(
                np.concatenate([v for v, _ in hist[-W:]], axis=-1)
            )
            img_window = (
                jnp.asarray(np.stack([im for _, im in hist[-W:]], axis=1))
                if i0 is not None else None
            )
            key, sk = jax.random.split(key)
            chunk = sample_chunk(params, window, img_window, sk)
            # denormalize back to the env's action scale
            chunk = (chunk + 1.0) / 2.0 * jnp.asarray(a_scale) + jnp.asarray(a_min)
            for k in range(args.act_steps):
                obs, rew, term, trunc, info = env.step(chunk[:, k])
                hist.append(parts(obs))
            success |= np.asarray(info["success"])
        print(f"eval success_once: {success.mean():.3f}")
        env.close()


if __name__ == "__main__":
    main()

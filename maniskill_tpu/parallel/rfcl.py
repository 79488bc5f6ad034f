"""Reverse-Forward Curriculum Learning (counterpart of the reference's
examples/baselines/rfcl/train.py:1-405, which wraps the external `rfcl` jax
package: rfcl.envs.wrappers.curriculum.ReverseCurriculumWrapper and
forward_curriculum.SeedBasedForwardCurriculumWrapper over a SAC learner).

Core idea (Tao et al., RFCL): with a handful of demonstrations, train SAC
starting episodes from demo states near the END of each demo (trivial to
succeed), and move the start state backward toward the demo's first state as
the per-demo success rate rises — the reverse curriculum. Once every demo's
start has reached t=0, switch to the forward phase: standard episodic resets
(mixed with demo-start resets) to generalize beyond demo states.

TPU-first design: demo states are a stacked state-dict pytree
(num_demos, T_max, ...) resident in HBM; per-demo curriculum pointers and
success EMAs live in the train state; the fused train_step gathers each
resetting env's start state with one index into the demo tensor. Resets run
through the same masked `_reset_impl` path a normal reset uses — the
curriculum reset handles envs flagged for demo starts and the standard reset
handles the rest, so the whole reverse->forward schedule executes inside one
compiled program with no host round-trips. The SAC learner (networks, ring
buffer, updates) mirrors parallel/sac.py, with demo transitions mixed 50/50
into update batches (the RLPD trick the reference also uses).

Simplification vs the reference: the forward phase uses uniform episodic
resets mixed with demo-start resets at `forward_demo_fraction`, rather than
the reference's per-seed prioritized level replay (score-transformed
staleness sampling over 1000s of seeds); with stateless batched resets every
seed is fresh, which removes the staleness problem that machinery solves.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .sac import SACConfig, SACState, TanhGaussianActor, TwinQ, _sample_action
from .train import make_env_step_fns


class RFCLConfig(NamedTuple):
    sac: SACConfig = SACConfig(ignore_terminations=False)
    reverse_step_size: int = 4      # states to step back per advance
    success_threshold: float = 0.75  # EMA needed to advance a demo's start
    ema: float = 0.34               # ~ last-3-attempts window (reference
                                    # per_demo_buffer_size=3)
    forward_demo_fraction: float = 0.25  # demo-start resets in fwd phase


class RFCLState(NamedTuple):
    sac: SACState
    k: jax.Array          # (D,) how far back from the demo end we start
    succ_ema: jax.Array   # (D,) per-demo success EMA at current k
    episodes: jax.Array   # total episodes finished (diagnostics)


def load_demo_states(h5path: str, num_demos: Optional[int] = None):
    """Read env_states from a RecordEpisode .h5 into a stacked pytree
    (D, T_max, ...) plus per-demo lengths (D,). Also returns flat
    (obs, act, rew, next_obs, term) demo transitions for replay mixing when
    the file carries flat state observations."""
    f = h5py.File(h5path, "r")
    names = sorted([k for k in f.keys() if k.startswith("traj_")],
                   key=lambda s: int(s.split("_")[1]))
    if num_demos is not None:
        names = names[:num_demos]

    def load_group(g):
        if isinstance(g, h5py.Group):
            return {k: load_group(v) for k, v in g.items()}
        return np.asarray(g[()])

    state_trees, lens = [], []
    trans = {"obs": [], "act": [], "rew": [], "next_obs": [], "term": []}
    for name in names:
        ep = f[name]
        states = load_group(ep["env_states"])  # leaves (T+1, ...)
        T = len(np.asarray(ep["actions"]))
        state_trees.append(states)
        lens.append(T + 1)
        obs = (
            np.asarray(ep["obs"][()])
            if "obs" in ep and isinstance(ep["obs"], h5py.Dataset)
            else None
        )
        if obs is not None and obs.ndim == 2:
            act = np.asarray(ep["actions"])
            rew = np.asarray(ep["rewards"]) if "rewards" in ep else np.zeros(T)
            term = (np.asarray(ep["terminated"]) if "terminated" in ep
                    else np.zeros(T, bool))
            trans["obs"].append(obs[:-1])
            trans["next_obs"].append(obs[1:])
            trans["act"].append(act)
            trans["rew"].append(rew)
            trans["term"].append(term)
    f.close()

    T_max = max(lens)

    def pad_stack(*leaves):
        out = []
        for leaf, L in zip(leaves, lens):
            pad = [(0, T_max - L)] + [(0, 0)] * (leaf.ndim - 1)
            out.append(np.pad(leaf, pad, mode="edge"))
        return jnp.asarray(np.stack(out))

    demo_states = jax.tree_util.tree_map(pad_stack, *state_trees)
    demo_lens = jnp.asarray(lens, jnp.int32)
    demos = None
    if trans["obs"]:
        demos = {
            "obs": jnp.asarray(np.concatenate(trans["obs"])),
            "act": jnp.asarray(np.concatenate(trans["act"])),
            "rew": jnp.asarray(np.concatenate(trans["rew"])),
            "next_obs": jnp.asarray(np.concatenate(trans["next_obs"])),
            "term": jnp.asarray(np.concatenate(trans["term"])),
        }
    return demo_states, demo_lens, demos


def make_rfcl_step(env, demo_states, demo_lens,
                   config: RFCLConfig = RFCLConfig(), demos=None):
    """Build (actor, init_state, train_step) for fused reverse-forward
    curriculum SAC. demo_states: stacked state-dict pytree (D, T_max, ...)."""
    cfg = config
    sac_cfg = cfg.sac
    base = env.unwrapped
    num_envs = base.num_envs
    D = int(demo_lens.shape[0])
    env_demo = jnp.arange(num_envs, dtype=jnp.int32) % D  # fixed assignment

    act_dim = int(np.prod(base.single_action_space.shape))
    step_fn, reset_fn = make_env_step_fns(env)
    actor = TanhGaussianActor(act_dim)
    qnet = TwinQ()

    from ..utils.gym_utils import find_max_episode_steps_value

    max_steps = find_max_episode_steps_value(env) or 50

    target_entropy = -float(act_dim)
    actor_tx = optax.adam(sac_cfg.lr)
    q_tx = optax.adam(sac_cfg.lr)
    alpha_tx = optax.adam(sac_cfg.alpha_lr)

    def init_state(key, obs_dim) -> RFCLState:
        k1, k2 = jax.random.split(key)
        zo = jnp.zeros((1, obs_dim))
        za = jnp.zeros((1, act_dim))
        actor_params = actor.init(k1, zo)
        q_params = qnet.init(k2, zo, za)
        S, B = sac_cfg.buffer_steps, num_envs
        sac = SACState(
            actor_params=actor_params,
            q_params=q_params,
            q_target=jax.tree.map(lambda x: x, q_params),
            log_alpha=jnp.zeros(()),
            actor_opt=actor_tx.init(actor_params),
            q_opt=q_tx.init(q_params),
            alpha_opt=alpha_tx.init(jnp.zeros(())),
            buf_obs=jnp.zeros((S, B, obs_dim)),
            buf_act=jnp.zeros((S, B, act_dim)),
            buf_rew=jnp.zeros((S, B)),
            buf_next_obs=jnp.zeros((S, B, obs_dim)),
            buf_term=jnp.zeros((S, B), bool),
            ptr=jnp.zeros((), jnp.int32),
            filled=jnp.zeros((), jnp.int32),
        )
        return RFCLState(
            sac=sac,
            k=jnp.ones((D,), jnp.int32),  # start one state from the end
            succ_ema=jnp.zeros((D,)),
            episodes=jnp.zeros((), jnp.int32),
        )

    def _gather_start_states(k):
        """Per-env start state at index max(T_d - 1 - k_d, 0) of its demo."""
        d = env_demo
        idx = jnp.maximum(demo_lens[d] - 1 - k[d], 0)  # (num_envs,)
        return jax.tree_util.tree_map(lambda x: x[d, idx], demo_states)

    def _reverse_done(k):
        return jnp.all(k >= demo_lens - 1)

    # -- curriculum rollout -------------------------------------------------

    def collect(state: RFCLState, data, obs, elapsed, key):
        start_states = _gather_start_states(state.k)
        reverse_phase = ~_reverse_done(state.k)

        def body(carry, _):
            data, obs, elapsed, key, ep_cnt, ep_succ = carry
            key, akey, rkey, rkey2, dkey = jax.random.split(key, 5)
            action, _ = _sample_action(actor, state.sac.actor_params, obs, akey)
            new_data, next_obs, reward, terminated = step_fn(data, action)
            elapsed = elapsed + 1
            truncated = (elapsed >= max_steps) & ~terminated
            done = terminated | truncated
            # tasks terminate on success: per-demo episode/success tallies
            ep_cnt = ep_cnt.at[env_demo].add(done.astype(jnp.float32))
            ep_succ = ep_succ.at[env_demo].add(
                (done & terminated).astype(jnp.float32)
            )
            # each resetting env resets EITHER to its curriculum demo state
            # or through the standard episodic path; both run masked
            use_demo = reverse_phase | (
                jax.random.uniform(dkey, (num_envs,))
                < cfg.forward_demo_fraction
            )
            keys1 = jax.random.split(rkey, num_envs)
            keys2 = jax.random.split(rkey2, num_envs)
            mid_data, _mid_obs, _ = base._reset_impl(
                new_data, done & use_demo, keys1, start_states
            )
            reset_data, reset_obs = reset_fn(mid_data, done & ~use_demo, keys2)
            elapsed = jnp.where(done, 0, elapsed)
            out = (obs, action, reward, next_obs, terminated)
            return (reset_data, reset_obs, elapsed, key, ep_cnt, ep_succ), out

        zeros_d = jnp.zeros((D,))
        (data, obs, elapsed, key, ep_cnt, ep_succ), traj = jax.lax.scan(
            body, (data, obs, elapsed, key, zeros_d, zeros_d), None,
            length=sac_cfg.rollout_steps,
        )
        return data, obs, elapsed, key, traj, ep_cnt, ep_succ

    # -- SAC losses (parallel/sac.py:177-249 semantics) ----------------------

    def q_loss(q_params, st: SACState, batch, key):
        obs, act, rew, next_obs, term = batch
        next_act, next_logp = _sample_action(actor, st.actor_params, next_obs, key)
        tq1, tq2 = qnet.apply(st.q_target, next_obs, next_act)
        alpha = jnp.exp(st.log_alpha)
        target = rew + sac_cfg.gamma * (1.0 - term) * (
            jnp.minimum(tq1, tq2) - alpha * next_logp
        )
        q1, q2 = qnet.apply(q_params, obs, act)
        target = jax.lax.stop_gradient(target)
        return jnp.mean((q1 - target) ** 2 + (q2 - target) ** 2)

    def actor_loss(actor_params, st: SACState, obs, key):
        act, logp = _sample_action(actor, actor_params, obs, key)
        q1, q2 = qnet.apply(st.q_params, obs, act)
        alpha = jnp.exp(st.log_alpha)
        return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

    def alpha_loss(log_alpha, logp):
        return -jnp.mean(
            jnp.exp(log_alpha) * (jax.lax.stop_gradient(logp) + target_entropy)
        )

    def update_once(st: SACState, key):
        k1, k2, k3 = jax.random.split(key, 3)
        n = st.filled * num_envs
        online_bs = (sac_cfg.batch_size // 2 if demos is not None
                     else sac_cfg.batch_size)
        idx = jax.random.randint(k1, (online_bs,), 0, n)
        s, b = idx // num_envs, idx % num_envs
        batch = (
            st.buf_obs[s, b], st.buf_act[s, b], st.buf_rew[s, b],
            st.buf_next_obs[s, b], st.buf_term[s, b].astype(jnp.float32),
        )
        if demos is not None:
            dk, k1 = jax.random.split(k1)
            di = jax.random.randint(
                dk, (sac_cfg.batch_size - online_bs,), 0,
                demos["obs"].shape[0],
            )
            batch = tuple(
                jnp.concatenate([x, d[di]], axis=0)
                for x, d in zip(
                    batch,
                    (demos["obs"], demos["act"], demos["rew"],
                     demos["next_obs"], demos["term"].astype(jnp.float32)),
                )
            )
        ql, qg = jax.value_and_grad(q_loss)(st.q_params, st, batch, k2)
        qup, q_opt = q_tx.update(qg, st.q_opt)
        q_params = optax.apply_updates(st.q_params, qup)
        st = st._replace(q_params=q_params, q_opt=q_opt)

        (al, logp), ag = jax.value_and_grad(actor_loss, has_aux=True)(
            st.actor_params, st, batch[0], k3
        )
        aup, actor_opt = actor_tx.update(ag, st.actor_opt)
        actor_params = optax.apply_updates(st.actor_params, aup)

        ell, eg = jax.value_and_grad(alpha_loss)(st.log_alpha, logp)
        eup, alpha_opt = alpha_tx.update(eg, st.alpha_opt)
        log_alpha = optax.apply_updates(st.log_alpha, eup)

        q_target = jax.tree.map(
            lambda t, p: t * (1 - sac_cfg.tau) + p * sac_cfg.tau,
            st.q_target, q_params,
        )
        return st._replace(
            actor_params=actor_params, actor_opt=actor_opt,
            log_alpha=log_alpha, alpha_opt=alpha_opt, q_target=q_target,
        ), (ql, al)

    def _updates(st: SACState, ukey, learn):
        def do(st):
            st, losses = jax.lax.scan(
                lambda s, k: update_once(s, k), st,
                jax.random.split(ukey, sac_cfg.utd),
            )
            return st, jax.tree.map(jnp.mean, losses)

        def skip(st):
            return st, (jnp.zeros(()), jnp.zeros(()))

        st, (ql, al) = jax.lax.cond(learn, do, skip, st)
        return st, dict(q_loss=ql, actor_loss=al, alpha=jnp.exp(st.log_alpha))

    # -- fused step ---------------------------------------------------------

    def train_step(state: RFCLState, data, obs, elapsed, key, learn):
        key, ckey, ukey = jax.random.split(key, 3)
        data, new_obs, elapsed, ckey, traj, ep_cnt, ep_succ = collect(
            state, data, obs, elapsed, ckey
        )
        o, a, r, next_o, t = traj
        sac = state.sac
        S = sac_cfg.buffer_steps
        sac = sac._replace(
            buf_obs=jax.lax.dynamic_update_slice_in_dim(sac.buf_obs, o, sac.ptr, 0),
            buf_act=jax.lax.dynamic_update_slice_in_dim(sac.buf_act, a, sac.ptr, 0),
            buf_rew=jax.lax.dynamic_update_slice_in_dim(sac.buf_rew, r, sac.ptr, 0),
            buf_next_obs=jax.lax.dynamic_update_slice_in_dim(
                sac.buf_next_obs, next_o, sac.ptr, 0
            ),
            buf_term=jax.lax.dynamic_update_slice_in_dim(
                sac.buf_term, t, sac.ptr, 0
            ),
            ptr=(sac.ptr + sac_cfg.rollout_steps) % S,
            filled=jnp.minimum(sac.filled + sac_cfg.rollout_steps, S),
        )

        # curriculum bookkeeping: success EMA per demo; advance + reset EMA
        rate = ep_succ / jnp.maximum(ep_cnt, 1)
        has_ep = ep_cnt > 0
        ema = jnp.where(
            has_ep, (1 - cfg.ema) * state.succ_ema + cfg.ema * rate,
            state.succ_ema,
        )
        advance = ema > cfg.success_threshold
        k = jnp.where(
            advance,
            jnp.minimum(state.k + cfg.reverse_step_size, demo_lens - 1),
            state.k,
        )
        ema = jnp.where(advance, 0.0, ema)

        sac, metrics = _updates(sac, ukey, learn)
        state = state._replace(
            sac=sac, k=k, succ_ema=ema,
            episodes=state.episodes + jnp.sum(ep_cnt).astype(jnp.int32),
        )
        metrics = dict(
            metrics,
            mean_k=jnp.mean(k.astype(jnp.float32)),
            reverse_done=_reverse_done(k).astype(jnp.float32),
            mean_succ_ema=jnp.mean(ema),
        )
        return state, data, new_obs, elapsed, key, metrics

    return actor, init_state, train_step

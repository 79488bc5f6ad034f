"""Benchmark driver: env.step throughput across the headline configurations.

Mirrors the reference's benchmark methodology
(mani_skill/examples/benchmarking/gpu_sim.py: env.step timed over N steps,
pd_joint_delta_pos control) and prints ONE JSON line per metric with
steps/sec vs the reference's RTX-4090 baselines (BASELINE.md). The headline
metric (FrankaMoveBenchmark-v1 state @4096) prints LAST so single-line
parsers pick it up.

Each measurement runs in a child process so a wedged accelerator client can
be retried with a fresh backend; the parent never imports jax.
"""
import json
import os
import subprocess
import sys
import time

_CHILD_FLAG = "MS_BENCH_CHILD"

# metric, env_id, num_envs, obs_mode, steps, baseline (RTX-4090, BASELINE.md)
# - pickcube_v1_state: baseline is OUR north-star target (125k steps/s/chip =
#   1M aggregate on v5e-8, BASELINE.json), not an RTX number.
# - rgbd_seg_vs_state_ratio: value is rgbd+seg fps / state fps on the same
#   env; baseline 0.909 encodes the <=10% render-overhead criterion
#   (BASELINE.json), so vs_baseline >= 1.0 means the criterion is met.
_SUITE = [
    ("cartpole_rgb_128_fps", "CartpoleBalanceBenchmark-v1", 1024, "rgb", 100, 32138.0),
    ("pickcube_rgb_128_fps", "PickCube-v1", 2048, "rgb", 100, 18601.0),
    ("pickcube_rgbd_seg_vs_state_ratio", "PickCube-v1", 2048, "rgb+depth+segmentation", 100, 0.909),
    ("pickcube_v1_state_steps_per_sec", "PickCube-v1", 4096, "state", 200, 125000.0),
    ("franka_pickcube_state_steps_per_sec", "FrankaPickCubeBenchmark-v1", 8192, "state", 200, 261546.0),
    ("franka_move_state_steps_per_sec", "FrankaMoveBenchmark-v1", 4096, "state", 200, 330096.0),
]


def _time_env(env_id, num_envs, obs_mode, steps):
    import jax
    import jax.numpy as jnp

    import maniskill_tpu.envs  # registers tasks
    from maniskill_tpu.utils.registration import make

    env = make(
        env_id,
        num_envs=num_envs,
        obs_mode=obs_mode,
        control_mode="pd_joint_delta_pos",
    )
    base = env.unwrapped
    env.reset(seed=0)

    act = jnp.zeros((num_envs,) + base.single_action_space.shape, jnp.float32)

    # warmup (compile)
    obs, *_ = env.step(act)
    jax.block_until_ready(obs)

    t0 = time.perf_counter()
    for _ in range(steps):
        obs, rew, term, trunc, info = env.step(act)
    jax.block_until_ready(obs)
    dt = time.perf_counter() - t0
    env.close()
    return num_envs * steps / dt


def measure(spec_idx: int):
    metric, env_id, num_envs, obs_mode, steps, baseline = _SUITE[spec_idx]
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", num_envs))
    steps = int(os.environ.get("BENCH_STEPS", steps))

    if metric.endswith("_ratio"):
        # render-overhead criterion: same env, rich visual obs vs state-only
        fps_vis = _time_env(env_id, num_envs, obs_mode, steps)
        fps_state = _time_env(env_id, num_envs, "state", steps)
        ratio = fps_vis / fps_state
        print(
            json.dumps(
                dict(
                    metric=metric,
                    value=round(ratio, 4),
                    unit="ratio",
                    vs_baseline=round(ratio / baseline, 3),
                )
            )
        )
        return

    steps_per_sec = _time_env(env_id, num_envs, obs_mode, steps)
    print(
        json.dumps(
            dict(
                metric=metric,
                value=round(steps_per_sec, 1),
                unit="env*steps/s",
                vs_baseline=round(steps_per_sec / baseline, 3),
            )
        )
    )


def _run_child(spec_idx: int) -> bool:
    env = dict(os.environ)
    env[_CHILD_FLAG] = str(spec_idx + 1)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    attempts = int(os.environ.get("BENCH_RETRIES", "3"))
    for attempt in range(attempts):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=int(os.environ.get("BENCH_TIMEOUT", "2400")),
            )
        except subprocess.TimeoutExpired:
            print(f"bench[{spec_idx}] attempt {attempt + 1} timed out", file=sys.stderr)
            continue
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                parsed = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(parsed, dict) and "metric" in parsed:
                print(line, flush=True)
                return True
        last_err = (proc.stderr or proc.stdout or "").strip()[-2000:]
        print(
            f"bench[{spec_idx}] attempt {attempt + 1}/{attempts} failed "
            f"(rc={proc.returncode}); retrying with a fresh backend",
            file=sys.stderr,
        )
        if last_err:
            print(last_err, file=sys.stderr)
        time.sleep(15 * (attempt + 1))
    return False


def main():
    child = os.environ.get(_CHILD_FLAG)
    if child:
        measure(int(child) - 1)
        return

    only = os.environ.get("BENCH_ONLY")  # comma-separated metric substrings
    failed = []
    ran = 0
    for i, spec in enumerate(_SUITE):
        if only and not any(tok in spec[0] for tok in only.split(",")):
            continue
        ran += 1
        if not _run_child(i):
            failed.append(spec[0])
    if ran == 0:
        print(f"bench failed: BENCH_ONLY={only!r} selected no metric", file=sys.stderr)
        sys.exit(1)
    if failed:
        # any selected metric producing no result is a failure — a wedged
        # headline config must not pass the gate because another row worked
        print(f"bench failed: no result for {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()

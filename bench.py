"""Benchmark driver: state-obs env.step throughput on FrankaMoveBenchmark-v1.

Mirrors the reference's benchmark methodology
(mani_skill/examples/benchmarking/gpu_sim.py: env.step timed over N steps,
pd_joint_delta_pos control) and prints ONE JSON line with steps/sec vs the
reference's RTX-4090 baseline (BASELINE.md: FrankaMoveBenchmark-v1 @ 4096
envs = 330,096 steps/s).

The measurement runs in a child process so a wedged accelerator client can be
retried with a fresh backend; the parent never imports jax.
"""
import json
import os
import subprocess
import sys
import time

_CHILD_FLAG = "MS_BENCH_CHILD"


def measure():
    # default matches the baseline row's config (BASELINE.md: FrankaMove @4096)
    num_envs = int(os.environ.get("BENCH_NUM_ENVS", "4096"))
    steps = int(os.environ.get("BENCH_STEPS", "100"))

    import jax
    import jax.numpy as jnp

    import maniskill_tpu.envs  # registers tasks
    from maniskill_tpu.utils.registration import make

    env_id = os.environ.get("BENCH_ENV_ID", "FrankaMoveBenchmark-v1")
    obs_mode = os.environ.get("BENCH_OBS_MODE", "state")
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

    steps_per_sec = num_envs * steps / dt
    baseline = float(os.environ.get("BENCH_BASELINE", "330096.0"))
    print(
        json.dumps(
            dict(
                metric="franka_move_state_steps_per_sec",
                value=round(steps_per_sec, 1),
                unit="env*steps/s",
                vs_baseline=round(steps_per_sec / baseline, 3),
            )
        )
    )


def main():
    if os.environ.get(_CHILD_FLAG):
        measure()
        return

    env = dict(os.environ)
    env[_CHILD_FLAG] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    attempts = int(os.environ.get("BENCH_RETRIES", "3"))
    last_err = ""
    for attempt in range(attempts):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=int(os.environ.get("BENCH_TIMEOUT", "3000")),
        )
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                parsed = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(parsed, dict) and "metric" in parsed:
                print(line)
                return
        last_err = (proc.stderr or proc.stdout or "").strip()[-2000:]
        print(
            f"bench attempt {attempt + 1}/{attempts} failed (rc={proc.returncode}); "
            "retrying with a fresh backend",
            file=sys.stderr,
        )
        if last_err:
            print(last_err, file=sys.stderr)
        time.sleep(15 * (attempt + 1))
    print(f"bench failed after {attempts} attempts", file=sys.stderr)
    sys.exit(1)


if __name__ == "__main__":
    main()

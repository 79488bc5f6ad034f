"""Break down FrankaMove step cost at 4096 envs: FK / dynamics / collide /
solve / full step, each jitted separately, plus the fused env.step."""
import os
import time

import jax
import jax.numpy as jnp

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make
from maniskill_tpu.physics import step as step_fn
from maniskill_tpu.physics.collision import collide
from maniskill_tpu.physics.dynamics import smooth_dynamics, spd_inverse, mass_matrix_and_bias
from maniskill_tpu.physics.kinematics import forward_kinematics
from maniskill_tpu.physics.solver import solve

N = int(os.environ.get("N", "4096"))
ENV_ID = os.environ.get("ENV_ID", "FrankaMoveBenchmark-v1")
env = make(ENV_ID, num_envs=N, obs_mode="state",
           control_mode="pd_joint_delta_pos")
base = env.unwrapped
env.reset(seed=0)
model = base.scene.model
data = base.scene.data
print("nbody", model.nbody, "nv", model.nv, "ngeom", model.ngeom,
      "npair", data.contact.pos.shape[1] if data.contact is not None else "?",
      "max_active", model.max_active_contacts,
      "solver_iters", model.solver_iterations)


def timeit(name, fn, *args, reps=50):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt*1e3:8.3f} ms")
    return out


data_fk = timeit("forward_kinematics", lambda d: forward_kinematics(model, d), data)
timeit("mass_matrix_and_bias", lambda d: mass_matrix_and_bias(model, d)[0], data_fk)
sd = timeit("smooth_dynamics", lambda d: smooth_dynamics(model, d)[:2], data_fk)
ct = timeit("collide", lambda d: collide(model, d), data_fk)
M = jnp.eye(model.nv)[None].repeat(N, 0) + 0.1 * jnp.ones((N, model.nv, model.nv))
timeit("spd_inverse", spd_inverse, M)
Minv, qvel_pred = sd
timeit("solve", lambda d, mi, qp, c: solve(model, d, mi, qp, c)[0],
       data_fk, Minv, qvel_pred, ct)
timeit("physics step (1 substep)", lambda d: step_fn(model, d), data)

act = jnp.zeros((N,) + base.single_action_space.shape, jnp.float32)
obs, *_ = env.step(act)
jax.block_until_ready(obs)
t0 = time.perf_counter()
for _ in range(50):
    obs, *_ = env.step(act)
jax.block_until_ready(obs)
dt = (time.perf_counter() - t0) / 50
print(f"{'env.step (fused)':28s} {dt*1e3:8.3f} ms   -> {N/dt:,.0f} steps/s")

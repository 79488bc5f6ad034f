"""Diagnose scripted motion-planning solutions: per-stage TCP/goal distances,
ref-point coverage, final success. Run on CPU:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/debug_mp.py DrawTriangle-v1
"""
import sys

import numpy as np


def main():
    env_id = sys.argv[1] if len(sys.argv) > 1 else "DrawTriangle-v1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0

    import jax.numpy as jnp

    import maniskill_tpu.envs  # noqa: F401
    from maniskill_tpu.utils.registration import make
    from maniskill_tpu.examples.motionplanning.solutions import SOLUTIONS

    env = make(env_id, num_envs=n, obs_mode="state", control_mode="pd_joint_pos")
    base = env.unwrapped
    env.reset(seed=seed)

    result = SOLUTIONS[env_id](env)
    info = result[-1]
    success = np.asarray(info.get("success", False))
    print(f"success: {success.sum()}/{len(np.atleast_1d(success))}")

    d = base.scene.data
    if "ref_hit" in d.extras:
        hit = np.asarray(d.extras["ref_hit"])
        print(f"ref_hit per env: {hit.sum(axis=-1)} / {hit.shape[-1]}")
        tcp = np.asarray(base.agent.tcp_pose.p)
        print(f"final tcp z: {tcp[:, 2]}")
    for k in ("obj_to_goal_dist", "obj_to_goal_angle"):
        if k in info:
            print(f"{k}: {np.asarray(info[k])}")
    if env_id == "PlugCharger-v1":
        print("charger p:", np.asarray(base.charger.pose.p))
        print("goal p   :", np.asarray(base.goal_pose.p))
    print("elapsed:", np.asarray(base.elapsed_steps)[:1] if hasattr(base, "elapsed_steps") else "?")


if __name__ == "__main__":
    main()

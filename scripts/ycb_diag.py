"""PickSingleYCB solution deep-dive: per-stage evaluate() + grasp geometry.

  PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/ycb_diag.py
"""
import numpy as np
import jax.numpy as jnp

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make
from maniskill_tpu.structs.pose import Pose
from maniskill_tpu.examples.motionplanning.panda_solver import (
    PandaMotionPlanningSolver,
)
from maniskill_tpu.examples.motionplanning.solutions import (
    _pose,
    _yawed_down_q,
)


def main():
    n, seed = 8, 0
    env = make(
        "PickSingleYCB-v1", num_envs=n, obs_mode="state",
        control_mode="pd_joint_pos",
    )
    base = env.unwrapped
    env.reset(seed=seed)
    print("model ids:", getattr(base, "model_ids", None) or getattr(base, "_model_ids", "?"))

    mp = PandaMotionPlanningSolver(env)
    mp.open_gripper(steps=3)

    hulls = np.asarray(base._pending_hulls)
    B = hulls.shape[0]
    pts_l = hulls.reshape(B, -1, 3)
    obj_pose = base.obj.pose
    N = pts_l.shape[1]
    rp = jnp.repeat(jnp.asarray(obj_pose.raw_pose, jnp.float32), N, axis=0)
    pts_w = Pose.create(rp).transform_point(
        jnp.asarray(pts_l, jnp.float32).reshape(B * N, 3)
    )
    pts_w = np.asarray(pts_w).reshape(B, N, 3)
    ztop = pts_w[..., 2].max(axis=1)
    zbot = pts_w[..., 2].min(axis=1)
    xy = pts_w[..., :2] - pts_w[..., :2].mean(axis=1, keepdims=True)
    cov = np.einsum("bni,bnj->bij", xy, xy) / xy.shape[1]
    evals, evecs = np.linalg.eigh(cov)
    minor_extent = 2.0 * np.sqrt(evals[:, 0].clip(0)) * 1.7  # rough width
    long_axis = evecs[..., -1]
    yaw = jnp.asarray(np.arctan2(long_axis[:, 1], long_axis[:, 0]), jnp.float32)
    grasp_q = _yawed_down_q(yaw)
    ctr = jnp.asarray(pts_w.mean(axis=1), jnp.float32)
    gz = jnp.asarray(np.clip(0.55 * ztop, 0.015, 0.055), jnp.float32)
    grasp = ctr.at[:, 2].set(gz)
    print("ztop:", np.round(ztop, 3), "\nzbot:", np.round(zbot, 3))
    print("grasp z:", np.asarray(gz).round(3))
    print("minor extent (~width):", np.round(minor_extent, 3), "(finger span 0.08)")

    def ev(name):
        e = {k: np.asarray(v) for k, v in base.evaluate().items()}
        d = np.linalg.norm(
            np.asarray(base.goal_site.pose.p) - np.asarray(base.obj.pose.p),
            axis=-1,
        )
        print(f"-- {name}: placed={e['is_obj_placed'].astype(int)} "
              f"static={e['is_robot_static'].astype(int)} "
              f"succ={e['success'].astype(int)} dist={np.round(d, 3)}")

    hover = grasp.at[:, 2].set(jnp.asarray(ztop, jnp.float32) + 0.08)
    mp.move_to_pose(_pose(hover, grasp_q), refine_steps=3)
    mp.move_to_pose(_pose(grasp, grasp_q), refine_steps=5)
    mp.close_gripper(steps=10)
    # grasp check: did the object come up with a small lift?
    obj_z0 = np.asarray(base.obj.pose.p)[:, 2].copy()
    mp.move_to_pose(_pose(grasp.at[:, 2].add(0.10), grasp_q), refine_steps=2)
    obj_z1 = np.asarray(base.obj.pose.p)[:, 2]
    print("lift dz:", np.round(obj_z1 - obj_z0, 3), "(>0.05 = grasped)")
    ev("after lift")

    goal_p = base.goal_site.pose.p
    obj_now = base.obj.pose.p
    tcp_now = base.agent.tcp.pose.p
    place = tcp_now + (goal_p - obj_now)
    mp.move_to_pose(_pose(place, grasp_q), refine_steps=6)
    ev("after carry")
    place = base.agent.tcp.pose.p + (goal_p - base.obj.pose.p)
    mp.move_to_pose(_pose(place, grasp_q), steps=20, refine_steps=8)
    ev("after re-place")
    print("elapsed:", mp.elapsed_steps)


if __name__ == "__main__":
    main()

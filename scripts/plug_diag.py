"""PlugCharger deep-dive: is the residual angular error TCP tracking error
or charger-in-gripper slip? Prints, at each solution stage, the commanded
TCP pose error (tracking) and the charger->TCP relative pose drift (slip).

  PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/plug_diag.py
"""
import numpy as np
import jax.numpy as jnp

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make
from maniskill_tpu.structs.pose import Pose
from maniskill_tpu.utils.geometry import rotation_conversions as rc
from maniskill_tpu.examples.motionplanning.panda_solver import (
    PandaMotionPlanningSolver,
)
from maniskill_tpu.examples.motionplanning.solutions import (
    _pose,
    _yaw_of,
    _yawed_down_q,
)


def ang_between(qa, qb):
    dq = rc.quaternion_multiply(rc.quaternion_conjugate(qa), qb)
    a = np.linalg.norm(np.asarray(rc.quaternion_to_axis_angle(dq)), axis=-1)
    return np.minimum(a, 2 * np.pi - a)


def rel(base):
    """charger pose in TCP frame (slip detector)."""
    return (base.agent.tcp.pose.inv() * base.charger.pose).raw_pose


def main():
    n, seed = 4, 0
    env = make(
        "PlugCharger-v1", num_envs=n, obs_mode="state",
        control_mode="pd_joint_pos",
    )
    base = env.unwrapped
    env.reset(seed=seed)

    mp = PandaMotionPlanningSolver(env, joint_vel_limit=0.6)
    mp.open_gripper(steps=3)

    ch0 = base.charger.pose
    yaw = _yaw_of(ch0.q)
    grasp_q = _yawed_down_q(yaw)
    B = n
    bz = base._base_size[2]
    base_ctr = Pose.create(ch0.raw_pose).transform_point(
        jnp.broadcast_to(
            jnp.asarray([-base._base_size[0], 0.0, 0.0], jnp.float32), (B, 3)
        )
    )
    grasp = base_ctr.at[:, 2].set(bz)
    hover = grasp.at[:, 2].set(0.08)
    mp.move_to_pose(_pose(hover, grasp_q), refine_steps=3)
    mp.move_to_pose(_pose(grasp, grasp_q), refine_steps=5)
    tcp = np.asarray(base.agent.tcp.pose.p)
    print("grasp tgt xy err:", np.linalg.norm(tcp[:, :2] - np.asarray(grasp)[:, :2], axis=-1))
    print("grasp tgt z:", tcp[:, 2], "want", bz)
    mp.close_gripper(steps=8)
    rel0 = np.asarray(rel(base))
    print("charger yaw:", np.asarray(yaw))

    def _off(dx):
        dx = jnp.broadcast_to(jnp.asarray(dx, jnp.float32), (B,))
        return Pose.create_from_pq(
            p=jnp.stack([dx, jnp.zeros(B), jnp.zeros(B)], axis=-1)
        )

    goal = base.goal_pose

    def stage(name, dx, steps, refine, arc=1):
        tgt = goal * _off(dx) * base.charger.pose.inv() * base.agent.tcp.pose
        tgt7 = np.asarray(tgt.raw_pose)
        mp.move_to_pose(tgt.raw_pose, steps=steps, refine_steps=refine, arc_steps=arc)
        got = np.asarray(base.agent.tcp.pose.raw_pose)
        track_p = np.linalg.norm(got[:, :3] - tgt7[:, :3], axis=-1)
        track_a = ang_between(tgt7[:, 3:], got[:, 3:])
        r = np.asarray(rel(base))
        slip_p = np.linalg.norm(r[:, :3] - rel0[:, :3], axis=-1)
        slip_a = ang_between(rel0[:, 3:], r[:, 3:])
        ev = {k: np.asarray(v) for k, v in base.evaluate().items()}
        print(f"-- {name}")
        print("   tcp track pos err:", np.round(track_p, 4), "ang:", np.round(track_a, 4))
        print("   grip slip  pos:", np.round(slip_p, 4), "ang:", np.round(slip_a, 4))
        print("   charger->goal dist:", np.round(ev["obj_to_goal_dist"], 4),
              "ang:", np.round(ev["obj_to_goal_angle"], 4))

    stage("pre -0.05 (arc)", -0.05, 80, 4, arc=6)
    stage("align -0.05 a", -0.05, 25, 5)
    stage("align -0.05 b", -0.05, 25, 5)
    mp.joint_vel_limit = 0.2
    stage("align -0.02", -0.02, 20, 4)
    stage("align -0.008", -0.008, 15, 4)
    stage("push +0.003", 0.003, 30, 10)
    print("elapsed:", mp.elapsed_steps)


if __name__ == "__main__":
    main()

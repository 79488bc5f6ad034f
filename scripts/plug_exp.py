"""PlugCharger insertion experiments: grasp pitch / wiggle / slow variants.

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=. \
      python scripts/plug_exp.py [variant ...]

Variants: base, pitch15, wiggle, pitch15_wiggle, slow
"""
import sys

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
    _quat_mul,
    _yaw_of,
    _yawed_down_q,
)


def run(variant: str, n=8, seed=0):
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
    if "pitch15" in variant:
        a = np.deg2rad(15.0)
        pitch = jnp.asarray([np.cos(a / 2), 0.0, np.sin(a / 2), 0.0],
                            jnp.float32)
        grasp_q = _quat_mul(grasp_q, jnp.broadcast_to(pitch, grasp_q.shape))
    B = n
    bz = base._base_size[2]
    base_ctr = Pose.create(ch0.raw_pose).transform_point(
        jnp.broadcast_to(
            jnp.asarray([-base._base_size[0], 0.0, 0.0], jnp.float32), (B, 3)
        )
    )
    grasp = base_ctr.at[:, 2].set(bz)
    high = grasp.at[:, 2].set(0.20)
    mp.move_to_pose(_pose(high, grasp_q), refine_steps=2)
    hover = grasp.at[:, 2].set(0.08)
    mp.move_to_pose(_pose(hover, grasp_q), refine_steps=3)
    mp.move_to_pose(_pose(grasp, grasp_q), refine_steps=5)
    tcp = np.asarray(base.agent.tcp.pose.p)
    xyerr = np.linalg.norm(tcp[:, :2] - np.asarray(grasp)[:, :2], axis=-1)
    mp.close_gripper(steps=8)

    def _off(dx, dy=0.0, dyaw=0.0):
        dx = jnp.broadcast_to(jnp.asarray(dx, jnp.float32), (B,))
        dy = jnp.broadcast_to(jnp.asarray(dy, jnp.float32), (B,))
        q = jnp.stack(
            [jnp.cos(jnp.full((B,), dyaw / 2)), jnp.zeros(B), jnp.zeros(B),
             jnp.sin(jnp.full((B,), dyaw / 2))], axis=-1
        )
        return Pose.create_from_pq(
            p=jnp.stack([dx, dy, jnp.zeros(B)], axis=-1), q=q
        )

    goal = base.goal_pose

    def _align(dx, steps, refine, dyaw=0.0, arc=1):
        tgt = (goal * _off(dx, dyaw=dyaw) * base.charger.pose.inv()
               * base.agent.tcp.pose)
        return mp.move_to_pose(tgt.raw_pose, steps=steps,
                               refine_steps=refine, arc_steps=arc)

    # TCP-in-charger at grasp time: reused to re-derive grasp targets later
    rel_grasp = base.charger.pose.inv() * base.agent.tcp.pose

    pre = goal * _off(-0.05) * base.charger.pose.inv() * base.agent.tcp.pose
    mp.move_to_pose(pre.raw_pose, steps=60, refine_steps=4, arc_steps=6)
    _align(-0.05, steps=20, refine=4)
    mp.joint_vel_limit = 0.2
    slow = "slow" in variant
    _align(-0.02, steps=30 if slow else 20, refine=6 if slow else 4)
    if "regrasp" in variant:
        # entry push: get the peg tips a few mm into the slots
        _align(-0.017, steps=10, refine=4)
        _align(0.0, steps=25, refine=6)
        ev = {k: np.asarray(v) for k, v in base.evaluate().items()}
        print("  after entry dist:", np.round(ev["obj_to_goal_dist"], 4))
        # release: the slots hold the charger and gravity/clearance settles
        # it straight, erasing the accumulated grip slip
        mp.open_gripper(steps=4)
        ev = {k: np.asarray(v) for k, v in base.evaluate().items()}
        print("  after release dist:", np.round(ev["obj_to_goal_dist"], 4),
              "ang:", np.round(ev["obj_to_goal_angle"], 4))
        # back off along the insertion axis, re-grasp the settled base
        back = (base.charger.pose * _off(-0.035)
                * Pose.create(rel_grasp.raw_pose))
        mp.move_to_pose(back.raw_pose, steps=12, refine_steps=3)
        regrip = base.charger.pose * Pose.create(rel_grasp.raw_pose)
        mp.move_to_pose(regrip.raw_pose, steps=10, refine_steps=4)
        mp.close_gripper(steps=6)
        result = _align(0.003, steps=25, refine=8)
    elif "pump" in variant:
        # retract/realign/push cycles: retracting un-wedges the two-point
        # jam, the re-measured align zeroes the angular error while free,
        # the push re-enters deeper
        _align(-0.017, steps=10, refine=4)
        for i in range(4):
            _align(-0.012, steps=8, refine=3)
            _align(0.002, steps=10, refine=3)
            ev = {k: np.asarray(v) for k, v in base.evaluate().items()}
            print(f"  pump {i} dist:", np.round(ev["obj_to_goal_dist"], 4),
                  "ang:", np.round(ev["obj_to_goal_angle"], 4))
        result = _align(0.003, steps=15, refine=8)
    elif "wiggle" in variant:
        _align(-0.008, steps=20 if slow else 15, refine=6 if slow else 4)
        for dyaw in (0.03, -0.03, 0.02, -0.02, 0.0):
            _align(0.001, steps=8, refine=2, dyaw=dyaw)
        result = _align(0.003, steps=15, refine=6)
    else:
        _align(-0.008, steps=20 if slow else 15, refine=6 if slow else 4)
        result = _align(0.003, steps=30, refine=10)
    info = result[-1]
    ev = {k: np.asarray(v) for k, v in base.evaluate().items()}
    print(f"{variant}: success {np.asarray(info['success']).mean():.2f} "
          f"({int(np.asarray(info['success']).sum())}/{n}) "
          f"steps={mp.elapsed_steps}")
    print("  grasp xyerr:", np.round(xyerr, 4))
    print("  dist:", np.round(ev["obj_to_goal_dist"], 4))
    print("  ang :", np.round(ev["obj_to_goal_angle"], 4))
    env.close()


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["base", "pitch15", "wiggle", "pitch15_wiggle"]):
        run(v)

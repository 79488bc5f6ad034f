"""Probe IK failure for PlugCharger env0's grasp pose (yaw=-0.874)."""
import numpy as np
import jax.numpy as jnp

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make
from maniskill_tpu.structs.pose import Pose
from maniskill_tpu.examples.motionplanning.panda_solver import (
    PandaMotionPlanningSolver,
)
from maniskill_tpu.examples.motionplanning.solutions import (
    _pose, _yaw_of, _yawed_down_q,
)

env = make("PlugCharger-v1", num_envs=4, obs_mode="state",
           control_mode="pd_joint_pos")
base = env.unwrapped
env.reset(seed=0)
mp = PandaMotionPlanningSolver(env, joint_vel_limit=0.6)

ch0 = base.charger.pose
yaw = _yaw_of(ch0.q)
print("yaw:", np.asarray(yaw))
grasp_q = _yawed_down_q(yaw)
B = 4
bz = base._base_size[2]
base_ctr = Pose.create(ch0.raw_pose).transform_point(
    jnp.broadcast_to(jnp.asarray([-base._base_size[0], 0.0, 0.0], jnp.float32),
                     (B, 3)))
grasp = base_ctr.at[:, 2].set(bz)
hover7 = _pose(grasp.at[:, 2].set(0.08), grasp_q)
grasp7 = _pose(grasp, grasp_q)

q0 = mp._arm_qpos()
print("q0:", np.round(np.asarray(q0[0]), 3))


def check(name, tgt, iters, qstart):
    qg = mp.kin.compute_ik(jnp.asarray(tgt), qstart, iterations=iters)
    dfk = mp.kin._fk(qg)
    eb = mp.kin.end_link.body_id
    p = np.asarray(dfk.xpos[:, eb])
    err = np.linalg.norm(p - np.asarray(tgt)[:, :3], axis=-1)
    qq = np.asarray(dfk.xquat[:, eb])
    dot = np.abs(np.sum(qq * np.asarray(tgt)[:, 3:], axis=-1))
    ang = 2 * np.arccos(np.clip(dot, -1, 1))
    print(f"{name} iters={iters} pos err:", np.round(err, 4),
          "ang err:", np.round(ang, 4))
    print("   qg[0]:", np.round(np.asarray(qg[0]), 3))
    return qg


qh = check("hover", hover7, 40, q0)
check("grasp-from-hover", grasp7, 40, qh)
check("grasp-direct", grasp7, 120, q0)

# pi-flipped yaw for all envs
yaw_flip = yaw - jnp.pi * jnp.sign(yaw)
gq2 = _yawed_down_q(yaw_flip)
check("grasp-flip", _pose(grasp, gq2), 80, q0)
print("dof limits j1..j7:",
      np.asarray(mp.kin.scene.model.dof_limit[mp.kin.dof_adrs]))

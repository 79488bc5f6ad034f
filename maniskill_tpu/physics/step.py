"""Physics step: the pure function the whole framework revolves around.

``step(model, data) -> data`` replaces the reference's
``px.step()`` + apply/fetch buffer protocol (SURVEY.md §2.2): there are no
host↔device copies, no staging buffers — state stays in HBM, and an env step
is ``lax.scan`` of substeps compiled into one XLA program together with
controllers, observation, and reward.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.geometry import rotation_conversions as rc
from .types import FIXED, FREE, HINGE, SLIDE, Contact, Data, Model
from .collision import collide
from .dynamics import smooth_dynamics
from .kinematics import forward_kinematics
from .solver import solve


def forward(model: Model, data: Data) -> Data:
    """Refresh derived quantities (FK + contacts) without advancing time.

    The equivalent of the reference's ``gpu_update_articulation_kinematics`` +
    ``gpu_fetch_*`` after writing qpos (mani_skill/envs/sapien_env.py:956-960).
    """
    with jax.default_matmul_precision("highest"):
        data = forward_kinematics(model, data)
        data = data.replace(contact=collide(model, data))
    return data


def step(model: Model, data: Data) -> Data:
    """Advance one physics substep (semi-implicit Euler).

    Kinematics are computed once in component form (batch-last, see cf.py)
    and shared by dynamics, collision, and the solver. The carried Data's
    xpos/xquat/cvel are NOT refreshed here (nothing inside the substep reads
    them; ``_step_impl`` runs a full ``forward_kinematics`` after the substep
    scan), which keeps them dead in the scan carry.
    """
    from .kinematics import forward_kinematics_cf

    h = model.timestep
    # f32 matmuls throughout the dynamics spine: TPU default precision feeds
    # the MXU bf16 operands, which truncates forces/velocities (~2^-8) and
    # accumulates per-substep integration error. The solver's inner-loop
    # matvecs opt back into bf16 explicitly (solver.py) where it is safe.
    with jax.default_matmul_precision("highest"):
        kin = forward_kinematics_cf(model, data.qpos, data.qvel)
        if model.drive6_body1 is not None and len(model.drive6_body1):
            from .drives import drive_wrenches

            data = data.replace(
                xfrc_applied=data.xfrc_applied + drive_wrenches(model, data, kin)
            )
        Minv, qvel_pred, qacc = smooth_dynamics(model, data, kin)
        contact = collide(model, data, kin)
        qvel_new, contact = solve(model, data, Minv, qvel_pred, contact, kin)
        # safety rail: bound velocities so one bad solve cannot cascade to inf
        qvel_new = jnp.clip(qvel_new, -model.max_qvel, model.max_qvel)

        qpos_new = integrate_qpos(model, data.qpos, qvel_new, h)
    return data.replace(
        qpos=qpos_new,
        qvel=qvel_new,
        qacc=qacc,
        contact=contact,
        # one-shot external forces are consumed by the step (PhysX semantics)
        qf_applied=jnp.zeros_like(data.qf_applied),
        xfrc_applied=jnp.zeros_like(data.xfrc_applied),
    )


def integrate_qpos(model: Model, qpos: jax.Array, qvel: jax.Array, h: float) -> jax.Array:
    """Semi-implicit Euler position update (exact quaternion exp for rotations).

    Fully vectorized: one gather/scatter for all 1-dof joints, one batched
    quaternion integration for all FREE bodies.
    """
    from .kinematics import fk_plan

    plan = fk_plan(model)
    out = qpos
    if len(plan.one_q):
        out = out.at[:, plan.one_q].add(h * qvel[:, plan.one_v])
    if len(plan.free):
        qp = qpos[:, plan.free_q_idx]  # (B, F, 7)
        vv = qvel[:, plan.free_v_idx]  # (B, F, 6)
        p = qp[..., :3] + h * vv[..., :3]
        q = rc.integrate_quaternion(qp[..., 3:7], vv[..., 3:6], h)
        out = out.at[:, plan.free_q_idx].set(jnp.concatenate([p, q], axis=-1))
    return out

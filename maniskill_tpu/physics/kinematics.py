"""Forward kinematics / velocity propagation / Jacobian building blocks.

The kinematic forest is unrolled at trace time (topology is static numpy in
``Model``); every per-body operation is batched over the env axis, so each
unrolled op is a (B, 3/4)-wide VPU op. This replaces the reference's
``px.gpu_update_articulation_kinematics`` (SURVEY.md §2.2) with a pure
function.

Conventions:
- world body = index 0 (STATIC, FIXED joint), pose = identity.
- FREE bodies store their world pose directly in qpos[adr:adr+7] = [p, q_wxyz]
  and world-frame velocity in qvel[adr:adr+6] = [v_origin, omega].
- ``cvel`` = (B, nbody, 6) world-frame [v_origin(3), omega(3)].
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import rotation_conversions as rc
from .types import BOX, FIXED, FREE, HINGE, SLIDE, Data, Model


def _bget(arr: jax.Array, idx: int) -> jax.Array:
    """Index a model parameter on its body/geom axis, tolerating an optional
    leading env batch axis (heterogeneous per-env parameters)."""
    return arr[..., idx, :] if arr.ndim >= 2 else arr[..., idx]


def _bget_scalar(arr: jax.Array, idx: int) -> jax.Array:
    return arr[..., idx]


def forward_kinematics(model: Model, data: Data) -> Data:
    """qpos -> world body poses (xpos, xquat) and velocities (cvel)."""
    B = data.batch_size
    qpos, qvel = data.qpos, data.qvel

    xpos = [jnp.zeros((B, 3), jnp.float32)]
    xquat = [jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], jnp.float32), (B, 4))]
    cvel = [jnp.zeros((B, 6), jnp.float32)]

    for b in range(1, model.nbody):
        p = int(model.body_parent[b])
        jt = int(model.body_jnt_type[b])
        qa = int(model.body_q_adr[b])
        va = int(model.body_dof_adr[b])

        if jt == FREE:
            pos = qpos[:, qa : qa + 3]
            quat = qpos[:, qa + 3 : qa + 7]
            v = qvel[:, va : va + 3]
            w = qvel[:, va + 3 : va + 6]
            xpos.append(pos)
            xquat.append(quat)
            cvel.append(jnp.concatenate([v, w], axis=-1))
            continue

        pp, pq = xpos[p], xquat[p]
        jpos = jnp.broadcast_to(_bget(model.body_pos, b), (B, 3))
        jquat = jnp.broadcast_to(_bget(model.body_quat, b), (B, 4))
        # joint frame in world
        fp = pp + rc.quaternion_apply(pq, jpos)
        fq = rc.quaternion_multiply(pq, jquat)
        r = fp - pp
        vw_p = cvel[p][:, :3]
        om_p = cvel[p][:, 3:]
        v = vw_p + jnp.cross(om_p, r)
        w = om_p

        if jt == FIXED:
            xpos.append(fp)
            xquat.append(fq)
            cvel.append(jnp.concatenate([v, w], axis=-1))
            continue

        q = qpos[:, qa : qa + 1]
        qd = qvel[:, va : va + 1]
        axis_l = jnp.broadcast_to(_bget(model.jnt_axis, b), (B, 3))
        axis_w = rc.quaternion_apply(fq, axis_l)
        if jt == HINGE:
            jq = rc.axis_angle_to_quaternion(axis_l * q)
            xquat.append(rc.quaternion_multiply(fq, jq))
            xpos.append(fp)
            w = w + axis_w * qd
            cvel.append(jnp.concatenate([v, w], axis=-1))
        elif jt == SLIDE:
            xquat.append(fq)
            xpos.append(fp + axis_w * q)
            v = v + jnp.cross(om_p, axis_w * q) + axis_w * qd
            cvel.append(jnp.concatenate([v, w], axis=-1))
        else:
            raise ValueError(f"unknown joint type {jt}")

    return data.replace(
        xpos=jnp.stack(xpos, axis=1),
        xquat=jnp.stack(xquat, axis=1),
        cvel=jnp.stack(cvel, axis=1),
    )


def dof_frames(model: Model, data: Data) -> Tuple[jax.Array, jax.Array]:
    """Per-dof world axis and anchor point.

    Returns (dof_axis (B, nv, 3), dof_anchor (B, nv, 3)). Rotational dofs
    rotate about (axis, anchor); translational dofs translate along axis.
    For FREE joints: 3 translational world-axis dofs + 3 rotational dofs
    anchored at the body origin.
    """
    B = data.batch_size
    eye = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    axes = [None] * model.nv
    anchors = [None] * model.nv
    for b in range(1, model.nbody):
        jt = int(model.body_jnt_type[b])
        va = int(model.body_dof_adr[b])
        if jt == FIXED:
            continue
        if jt == FREE:
            origin = data.xpos[:, b]
            for i in range(3):
                axes[va + i] = eye[:, i]
                anchors[va + i] = origin
            for i in range(3):
                axes[va + 3 + i] = eye[:, i]
                anchors[va + 3 + i] = origin
        else:
            axis_l = jnp.broadcast_to(_bget(model.jnt_axis, b), (B, 3))
            axes[va] = rc.quaternion_apply(data.xquat[:, b], axis_l)
            anchors[va] = data.xpos[:, b]
    dof_axis = jnp.stack(axes, axis=1)
    dof_anchor = jnp.stack(anchors, axis=1)
    return dof_axis, dof_anchor


def point_jacobian(
    model: Model,
    data: Data,
    dof_axis: jax.Array,
    dof_anchor: jax.Array,
    body: int,
    point: jax.Array,
) -> jax.Array:
    """Translational Jacobian (B, nv, 3) of world ``point`` attached to ``body``.

    Zero for KINEMATIC/STATIC bodies (infinite effective mass in the solver).
    """
    B = data.batch_size
    mask = model.ancestor_mask[body]  # (nv,)
    if int(model.body_type[body]) != 0:  # not DYNAMIC
        return jnp.zeros((B, model.nv, 3), jnp.float32)
    is_rot = jnp.asarray(model.dof_is_rot)[None, :, None]  # (1, nv, 1)
    rel = point[:, None, :] - dof_anchor  # (B, nv, 3)
    j_rot = jnp.cross(dof_axis, rel)
    j = jnp.where(is_rot, j_rot, dof_axis)
    return j * jnp.asarray(mask, jnp.float32)[None, :, None]


def body_jacobians(
    model: Model, data: Data, dof_axis: jax.Array, dof_anchor: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """COM-point translational + rotational Jacobians for all bodies.

    Returns (jac_lin (B, nbody, nv, 3), jac_rot (B, nbody, nv, 3)) — the
    building block for the CRB mass matrix and bias forces.
    """
    B = data.batch_size
    nb, nv = model.nbody, model.nv
    mask = jnp.asarray(model.ancestor_mask, jnp.float32)  # (nbody, nv)
    # world COM of each body
    ipos = jnp.broadcast_to(model.body_ipos, (B, nb, 3)) if model.body_ipos.ndim == 2 else model.body_ipos
    com = data.xpos + rc.quaternion_apply(data.xquat, ipos)  # (B, nb, 3)
    is_rot = jnp.asarray(model.dof_is_rot)[None, None, :, None]  # (1,1,nv,1)
    rel = com[:, :, None, :] - dof_anchor[:, None, :, :]  # (B, nb, nv, 3)
    j_rot_lin = jnp.cross(dof_axis[:, None], rel)
    jac_lin = jnp.where(is_rot, j_rot_lin, dof_axis[:, None])
    jac_rot = jnp.where(is_rot, dof_axis[:, None], 0.0)
    m = mask[None, :, :, None]
    # static/kinematic bodies contribute nothing
    dyn = jnp.asarray(model.body_type == 0, jnp.float32)[None, :, None, None]
    return jac_lin * m * dyn, jac_rot * m * dyn


def body_com(model: Model, data: Data) -> jax.Array:
    B = data.batch_size
    ipos = jnp.broadcast_to(model.body_ipos, (B, model.nbody, 3)) if model.body_ipos.ndim == 2 else model.body_ipos
    return data.xpos + rc.quaternion_apply(data.xquat, ipos)


def geom_poses(model: Model, data: Data) -> Tuple[jax.Array, jax.Array]:
    """World poses of all geoms: (B, ngeom, 3), (B, ngeom, 4)."""
    gb = np.asarray(model.geom_body)  # (ngeom,)
    bp = data.xpos[:, gb]  # (B, ngeom, 3)
    bq = data.xquat[:, gb]
    B = data.batch_size
    gp = model.geom_pos if model.geom_pos.ndim == 3 else jnp.broadcast_to(model.geom_pos, (B,) + model.geom_pos.shape)
    gq = model.geom_quat if model.geom_quat.ndim == 3 else jnp.broadcast_to(model.geom_quat, (B,) + model.geom_quat.shape)
    pos = bp + rc.quaternion_apply(bq, gp)
    quat = rc.quaternion_multiply(bq, gq)
    return pos, quat

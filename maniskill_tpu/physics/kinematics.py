"""Forward kinematics / velocity propagation / Jacobian building blocks.

The kinematic forest is processed LEVEL-BY-LEVEL (all bodies at the same
tree depth in one batched op): the sequential chain length is the tree depth,
not the body count, and every level is a handful of (B, L, 3/4) vector ops —
XLA sees ~depth x 15 fused ops instead of nbody x 10 scalar-width ones. This
replaces the reference's ``px.gpu_update_articulation_kinematics``
(SURVEY.md §2.2) with a pure function.

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
from . import cf
from .types import BOX, FIXED, FREE, HINGE, SLIDE, Data, Model
from .types import f32_matmuls

_PLAN_CACHE: dict = {}


class _FKPlan:
    """Static index tables for level-scheduled kinematics (numpy only)."""

    def __init__(self, model: Model):
        nb = model.nbody
        jt = np.asarray(model.body_jnt_type)
        parent = np.asarray(model.body_parent)
        q_adr = np.asarray(model.body_q_adr)
        dof_adr = np.asarray(model.body_dof_adr)

        self.free = np.nonzero(jt == FREE)[0].astype(np.int32)
        if len(self.free):
            self.free_q_idx = (
                q_adr[self.free][:, None] + np.arange(7)[None]
            ).astype(np.int32)
            self.free_v_idx = (
                dof_adr[self.free][:, None] + np.arange(6)[None]
            ).astype(np.int32)

        # tree depth (free bodies are roots: their pose ignores the parent)
        depth = np.zeros(nb, np.int64)
        for b in range(1, nb):
            depth[b] = 0 if jt[b] == FREE else depth[parent[b]] + 1
        self.levels = []
        maxd = int(depth.max()) if nb > 1 else 0
        for d in range(1, maxd + 1):
            bl = np.nonzero((depth == d) & (jt != FREE))[0].astype(np.int32)
            if len(bl) == 0:
                continue
            lv = dict(
                bodies=bl,
                parents=parent[bl].astype(np.int32),
                is_hinge=(jt[bl] == HINGE),
                is_slide=(jt[bl] == SLIDE),
                has_q=((jt[bl] == HINGE) | (jt[bl] == SLIDE)),
                # FIXED joints gather slot 0 and mask to zero
                q_idx=np.where(jt[bl] == FIXED, 0, q_adr[bl]).astype(np.int32),
                v_idx=np.where(jt[bl] == FIXED, 0, dof_adr[bl]).astype(np.int32),
            )
            self.levels.append(lv)

        # ---- per-dof tables (dof_frames / joint_positions) ----
        nv = model.nv
        dof_body = np.asarray(model.dof_body)
        self.dof_body = dof_body.astype(np.int32)
        is_free_dof = np.zeros(nv, bool)
        const_axis = np.zeros((nv, 3), np.float32)
        q_of_dof = np.zeros(nv, np.int32)
        q_mask = np.zeros(nv, np.float32)
        for b in range(nb):
            va = int(dof_adr[b])
            if jt[b] == FREE:
                for i in range(6):
                    is_free_dof[va + i] = True
                    const_axis[va + i, i % 3] = 1.0
            elif jt[b] in (HINGE, SLIDE):
                q_of_dof[va] = q_adr[b]
                q_mask[va] = 1.0
        self.is_free_dof = is_free_dof
        self.const_axis = const_axis
        self.q_of_dof = q_of_dof
        self.q_mask = q_mask

        # 1-dof joints for integrate_qpos
        one = np.nonzero((jt == HINGE) | (jt == SLIDE))[0]
        self.one_q = q_adr[one].astype(np.int32)
        self.one_v = dof_adr[one].astype(np.int32)


def fk_plan(model: Model) -> _FKPlan:
    key = (
        model.body_parent,
        model.body_jnt_type,
        model.body_q_adr,
        model.body_dof_adr,
        model.dof_body,
    )
    plan = _PLAN_CACHE.get(key)
    if plan is None:
        plan = _FKPlan(model)
        _PLAN_CACHE[key] = plan
    return plan


def _gb(arr: jax.Array, idx: np.ndarray) -> jax.Array:
    """Gather model parameters on the body/geom axis, tolerating an optional
    leading env batch axis (heterogeneous per-env parameters)."""
    return arr[..., idx, :] if arr.ndim >= 2 else arr[..., idx]


def _bget(arr: jax.Array, idx: int) -> jax.Array:
    return arr[..., idx, :] if arr.ndim >= 2 else arr[..., idx]


# ======================================================================
# component-form (batch-last) kinematics — the hot path (see cf.py)
# ======================================================================

def _cfp(arr: jax.Array, idx: np.ndarray) -> jax.Array:
    """Model vector param -> component-first slice (k, L, 1|B).

    (n, k) static params give (k, L, 1) (broadcast over batch);
    (B, n, k) heterogeneous params give (k, L, B).
    """
    if arr.ndim == 2:
        return arr.T[:, idx][..., None]
    return cf.bf(arr)[:, idx]


@f32_matmuls
def forward_kinematics_cf(model: Model, qpos: jax.Array, qvel: jax.Array):
    """qpos (B, nq), qvel (B, nv) -> (xpos (3,nb,B), xquat (4,nb,B),
    v (3,nb,B), w (3,nb,B)) in world frame, batch-last.

    The four state fields ride ONE packed (13, nb, B) array through the
    level loop so each level costs a single gather + a single scatter."""
    B = qpos.shape[0]
    nb = model.nbody
    plan = fk_plan(model)
    qp = qpos.T  # (nq, B)
    qv = qvel.T  # (nv, B)

    # rows: 0:3 xpos, 3:7 xquat, 7:10 v, 10:13 w
    st = jnp.zeros((13, nb, B), jnp.float32).at[3].set(1.0)

    if len(plan.free):
        qf = jnp.swapaxes(qp[plan.free_q_idx], 0, 1)  # (7, F, B)
        vf = jnp.swapaxes(qv[plan.free_v_idx], 0, 1)  # (6, F, B)
        st = st.at[:, plan.free].set(jnp.concatenate([qf, vf], axis=0))

    for lv in plan.levels:
        bl, pl = lv["bodies"], lv["parents"]
        par = st[:, pl]  # (13, L, B)
        pp, pq, vp, om_p = par[0:3], par[3:7], par[7:10], par[10:13]
        jpos = _cfp(model.body_pos, bl)
        jquat = _cfp(model.body_quat, bl)
        fp = pp + cf.qapply_c(pq, jnp.broadcast_to(jpos, pp.shape))
        fq = cf.qmul_c(pq, jnp.broadcast_to(jquat, pq.shape))
        vv = vp + cf.cross_c(om_p, fp - pp)

        has_q = jnp.asarray(lv["has_q"], jnp.float32)[:, None]  # (L, 1)
        q = qp[lv["q_idx"]] * has_q  # (L, B)
        qd = qv[lv["v_idx"]] * has_q
        axis_l = jnp.broadcast_to(_cfp(model.jnt_axis, bl), fp.shape)
        axis_w = cf.qapply_c(fq, axis_l)

        hinge = jnp.asarray(lv["is_hinge"])[None, :, None]  # (1, L, 1)
        slide = jnp.asarray(lv["is_slide"])[None, :, None]

        jq = cf.aa_to_quat_c(axis_l * q[None])
        xq = jnp.where(hinge, cf.qmul_c(fq, jq), fq)
        xp = jnp.where(slide, fp + axis_w * q[None], fp)
        ww = jnp.where(hinge, om_p + axis_w * qd[None], om_p)
        vv = jnp.where(
            slide, vv + cf.cross_c(om_p, axis_w * q[None]) + axis_w * qd[None], vv
        )

        st = st.at[:, bl].set(jnp.concatenate([xp, xq, vv, ww], axis=0))

    return st[0:3], st[3:7], st[7:10], st[10:13]


def dof_frames_cf(model: Model, xpos_c: jax.Array, xquat_c: jax.Array):
    """Per-dof world axis/anchor, batch-last: (3, nv, B) each."""
    plan = fk_plan(model)
    db = plan.dof_body
    anchor = xpos_c[:, db]  # (3, nv, B)
    axis_l = jnp.broadcast_to(_cfp(model.jnt_axis, db), anchor.shape)
    axis_w = cf.qapply_c(xquat_c[:, db], axis_l)
    free = jnp.asarray(plan.is_free_dof)[None, :, None]
    caxis = jnp.asarray(plan.const_axis.T)[:, :, None]  # (3, nv, 1)
    axis = jnp.where(free, caxis, axis_w)
    return axis, anchor


def geom_poses_cf(model: Model, xpos_c: jax.Array, xquat_c: jax.Array):
    """World geom poses, batch-last: ((3, ngeom, B), (4, ngeom, B))."""
    gb = np.asarray(model.geom_body)
    bp = xpos_c[:, gb]
    bq = xquat_c[:, gb]
    gp = jnp.broadcast_to(_cfp(model.geom_pos, np.arange(model.ngeom)), bp.shape)
    gq = jnp.broadcast_to(_cfp(model.geom_quat, np.arange(model.ngeom)), bq.shape)
    pos = bp + cf.qapply_c(bq, gp)
    quat = cf.qmul_c(bq, gq)
    return pos, quat


@f32_matmuls
def forward_kinematics(model: Model, data: Data) -> Data:
    """qpos -> world body poses (xpos, xquat) and velocities (cvel).

    Thin wrapper over the component-form implementation (batch-first views
    for the struct layer / task code)."""
    xpos_c, xquat_c, v_c, w_c = forward_kinematics_cf(model, data.qpos, data.qvel)
    cvel = jnp.concatenate([cf.fb(v_c), cf.fb(w_c)], axis=-1)
    xpos, xquat = cf.fb(xpos_c), cf.fb(xquat_c)
    if model.mocap_bodies is not None and data.mocap_pose is not None:
        # dof-less marker bodies: splice their per-env poses in (static-index
        # scatter). The dynamics/collision spine never reads these bodies.
        mb = np.asarray(model.mocap_bodies)
        xpos = xpos.at[:, mb].set(data.mocap_pose[..., :3])
        xquat = xquat.at[:, mb].set(data.mocap_pose[..., 3:7])
    return data.replace(xpos=xpos, xquat=xquat, cvel=cvel)


def dof_frames(model: Model, data: Data) -> Tuple[jax.Array, jax.Array]:
    """Per-dof world axis and anchor point — one batched gather, no loops.

    Returns (dof_axis (B, nv, 3), dof_anchor (B, nv, 3)). Rotational dofs
    rotate about (axis, anchor); translational dofs translate along axis.
    For FREE joints: 3 translational world-axis dofs + 3 rotational dofs
    anchored at the body origin.
    """
    plan = fk_plan(model)
    db = plan.dof_body
    anchor = data.xpos[:, db]  # (B, nv, 3)
    axis_l = _gb(model.jnt_axis, db)  # (nv, 3) or (B, nv, 3)
    axis_l = jnp.broadcast_to(axis_l, anchor.shape)
    axis_w = rc.quaternion_apply(data.xquat[:, db], axis_l)
    free = jnp.asarray(plan.is_free_dof)[None, :, None]
    axis = jnp.where(free, jnp.asarray(plan.const_axis)[None], axis_w)
    return axis, anchor


@f32_matmuls
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


@f32_matmuls
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

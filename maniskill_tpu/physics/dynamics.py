"""Smooth (contact-free) dynamics: mass matrix, bias forces, PD actuation.

Replaces the reference's PhysX articulation dynamics (SURVEY.md §2.1) with a
batched composite-rigid-body formulation expressed through COM Jacobians:

    M(q)      = Σ_b J_lin^T m_b J_lin + J_rot^T I_b J_rot
    c(q, qd)  = Σ_b J_lin·m_b(a_com_bias - g) + J_rot·(I α_bias + ω×(I ω))

which lowers to batched einsums (MXU-friendly) instead of sequential spatial
algebra. nv is small (≈10-30) so the O(nv²) terms are negligible; the batch
axis (num_envs) provides the vector width.

PD joint drives (the reference's joint drive force mode,
mani_skill/utils/structs/articulation_joint.py:187-195) are applied as
explicit torque with *implicit* damping: the kd (and dof damping) terms are
added to the LHS diagonal, (M + h·diag(kd + damping)) qacc = τ, which keeps
stiff gains stable at the 100 Hz default timestep.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import rotation_conversions as rc
from . import cf
from .types import FIXED, FREE, HINGE, SLIDE, Data, Model
from .types import f32_matmuls
from .kinematics import body_com, body_jacobians, dof_frames


def bias_accelerations(model: Model, data: Data) -> Tuple[jax.Array, jax.Array]:
    """Velocity-product (qacc = 0) accelerations of each body.

    Level-scheduled over tree depth (like forward_kinematics): each level is
    a handful of batched (B, L, 3) ops. Returns (a_origin (B, nbody, 3),
    alpha (B, nbody, 3)) in world frame; FREE bodies have zero bias.
    """
    from .kinematics import _gb, fk_plan

    B = data.batch_size
    nb = model.nbody
    plan = fk_plan(model)
    a = jnp.zeros((B, nb, 3), jnp.float32)
    al = jnp.zeros((B, nb, 3), jnp.float32)
    for lv in plan.levels:
        bl, pl = lv["bodies"], lv["parents"]
        r = data.xpos[:, bl] - data.xpos[:, pl]
        om_p = data.cvel[:, pl, 3:]
        v_rel = data.cvel[:, bl, :3] - data.cvel[:, pl, :3]
        a_b = a[:, pl] + jnp.cross(al[:, pl], r) + jnp.cross(om_p, v_rel)
        al_b = al[:, pl]
        qd = (data.qvel[:, lv["v_idx"]] * jnp.asarray(lv["has_q"], jnp.float32))[
            ..., None
        ]
        axis_l = jnp.broadcast_to(_gb(model.jnt_axis, bl), r.shape)
        axis_w = rc.quaternion_apply(data.xquat[:, bl], axis_l)
        cor = jnp.cross(om_p, axis_w * qd)
        hinge = jnp.asarray(lv["is_hinge"])[None, :, None]
        slide = jnp.asarray(lv["is_slide"])[None, :, None]
        al_b = jnp.where(hinge, al_b + cor, al_b)
        a_b = jnp.where(slide, a_b + cor, a_b)
        a = a.at[:, bl].set(a_b)
        al = al.at[:, bl].set(al_b)
    return a, al


def _joint_world_axis(model: Model, data: Data, b: int) -> jax.Array:
    from .kinematics import _bget

    B = data.batch_size
    axis_l = jnp.broadcast_to(_bget(model.jnt_axis, b), (B, 3))
    return rc.quaternion_apply(data.xquat[:, b], axis_l)


def world_inertia(model: Model, data: Data) -> jax.Array:
    """World-frame 3x3 rotational inertia about COM for each body: (B, nb, 3, 3)."""
    B = data.batch_size
    nb = model.nbody
    iquat = model.body_iquat if model.body_iquat.ndim == 3 else jnp.broadcast_to(model.body_iquat, (B, nb, 4))
    q = rc.quaternion_multiply(data.xquat, iquat)  # world <- inertial frame
    R = rc.quaternion_to_matrix(q)  # (B, nb, 3, 3)
    diag = model.body_inertia if model.body_inertia.ndim == 3 else jnp.broadcast_to(model.body_inertia, (B, nb, 3))
    return jnp.einsum("...ij,...j,...kj->...ik", R, diag, R)


def _symv(S6: jax.Array, v: jax.Array) -> jax.Array:
    """Symmetric 3x3 matvec from packed [xx,yy,zz,xy,xz,yz] components."""
    xx, yy, zz, xy, xz, yz = (S6[..., i] for i in range(6))
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [
            xx * vx + xy * vy + xz * vz,
            xy * vx + yy * vy + yz * vz,
            xz * vx + yz * vy + zz * vz,
        ],
        axis=-1,
    )


_CRB_CACHE: dict = {}


def _crb_masks(model: Model):
    """Static (nv, nv) lower/strict masks: DL[d,e]=1 iff dof d lies on the
    chain from world to body(e) and e >= d (dof order = depth order)."""
    key = (model.ancestor_mask, model.dof_body)
    out = _CRB_CACHE.get(key)
    if out is None:
        anc = np.asarray(model.ancestor_mask)  # (nb, nv)
        db = np.asarray(model.dof_body)
        on_chain = anc[db, :].T  # (nv_d, nv_e): d on chain of body(e)
        order = np.arange(model.nv)
        # cache numpy (NOT jnp: inside a trace jnp constants are tracers and
        # would leak out of the trace via this module-level cache)
        dl = (on_chain * (order[None, :] >= order[:, None])).astype(np.float32)
        dls = (on_chain * (order[None, :] > order[:, None])).astype(np.float32)
        out = (dl, dls)
        _CRB_CACHE[key] = out
    return out


@f32_matmuls
def mass_matrix_and_bias_cf(
    model: Model, data: Data, kin
) -> Tuple[jax.Array, jax.Array]:
    """Returns (M (B,nv,nv), qfrc_bias (B,nv)), computed batch-last.

    Composite-rigid-body via subtree *moments*: instead of materializing
    (B, nbody, nv, 3) COM jacobians and contracting them (the HBM-traffic
    hot spot), accumulate per-body moments [m, m c, m|c|^2, m c c^T, I_w,
    f, c x f + tau] over each dof's subtree with ONE einsum against the
    static ancestor mask, then assemble M[d,e] = A_d . X_e + H_d . Y_e from
    per-dof 3-vectors. All field intermediates are component-first (k, n, B)
    so the env batch rides the 128-lane axis (see cf.py). Equations of
    motion: M qacc = tau - qfrc_bias.

    Derivation: for dofs d (shallower) and e on one chain, with subtree
    S = subtree(body(e)), axis a, anchor p, h = a x p:
      rot-rot:  sum_S m (a_d x (c - p_d)) . (a_e x (c - p_e)) + a_d^T I^c a_e
              = a_d.[trS a_e - S2 a_e - mc x h_e + I^c a_e] + h_d.[mC h_e - a_e x mc]
      rot-trn:  a_d.(mc x a_e) - mC h_d.a_e
      trn-rot:  a_d.(a_e x mc - mC h_e)
      trn-trn:  mC a_d.a_e
    which all fold into one (B,nv,6)x(B,nv,6) -> (B,nv,nv) contraction.
    """
    from .kinematics import _cfp, dof_frames_cf, fk_plan

    xpos_c, xquat_c, v_c, w_c = kin
    B = data.batch_size
    nb, nv = model.nbody, model.nv
    plan = fk_plan(model)
    all_b = np.arange(nb)

    dyn = jnp.asarray(model.body_type == 0, jnp.float32)[:, None]  # (nb, 1)
    mass = (
        model.body_mass.T if model.body_mass.ndim == 2 else model.body_mass[:, None]
    )  # (nb, B|1)
    m = mass * dyn

    # world COM (3, nb, B)
    ipos = jnp.broadcast_to(_cfp(model.body_ipos, all_b), xpos_c.shape)
    com = xpos_c + cf.qapply_c(xquat_c, ipos)

    # world inertia symmetric components (6, nb, B), masked by dyn
    iquat = jnp.broadcast_to(_cfp(model.body_iquat, all_b), xquat_c.shape)
    qI = cf.qmul_c(xquat_c, iquat)
    R = cf.quat_to_mat_c(qI)  # 3x3 nest of (nb, B)
    idiag = _cfp(model.body_inertia, all_b)  # (3, nb, 1|B)
    d0, d1, d2 = idiag[0], idiag[1], idiag[2]

    def iw(i, j):
        return (R[i][0] * d0 * R[j][0] + R[i][1] * d1 * R[j][1] + R[i][2] * d2 * R[j][2]) * dyn

    J2 = jnp.stack([iw(0, 0), iw(1, 1), iw(2, 2), iw(0, 1), iw(0, 2), iw(1, 2)], 0)

    # ---- velocity-product (bias) accelerations, level-scheduled ----
    qv = data.qvel.T  # (nv, B)
    a0 = jnp.zeros((3, nb, B), jnp.float32)
    al0 = jnp.zeros((3, nb, B), jnp.float32)
    for lv in plan.levels:
        bl, pl = lv["bodies"], lv["parents"]
        r = xpos_c[:, bl] - xpos_c[:, pl]
        om_p = w_c[:, pl]
        v_rel = v_c[:, bl] - v_c[:, pl]
        a_b = a0[:, pl] + cf.cross_c(al0[:, pl], r) + cf.cross_c(om_p, v_rel)
        al_b = al0[:, pl]
        has_q = jnp.asarray(lv["has_q"], jnp.float32)[:, None]
        qd = (qv[lv["v_idx"]] * has_q)[None]  # (1, L, B)
        axis_l = jnp.broadcast_to(_cfp(model.jnt_axis, bl), r.shape)
        axis_w = cf.qapply_c(xquat_c[:, bl], axis_l)
        cor = cf.cross_c(om_p, axis_w * qd)
        hinge = jnp.asarray(lv["is_hinge"])[None, :, None]
        slide = jnp.asarray(lv["is_slide"])[None, :, None]
        al_b = jnp.where(hinge, al_b + cor, al_b)
        a_b = jnp.where(slide, a_b + cor, a_b)
        a0 = a0.at[:, bl].set(a_b)
        al0 = al0.at[:, bl].set(al_b)

    rc_ = com - xpos_c
    om = w_c
    a_com = a0 + cf.cross_c(al0, rc_) + cf.cross_c(om, cf.cross_c(om, rc_))

    # per-body gravity compensation (the reference's balance_passive_force on
    # GPU disables link gravity, base_agent.py:278-284; here it's a mask)
    gc = model.body_gravcomp
    gc = gc.T if gc.ndim == 2 else gc[:, None]  # (nb, B|1)
    g = model.gravity[:, None, None] * (1.0 - gc)[None]  # (3, nb, B|1)
    # net bias force/torque per body, folding in externally applied wrenches
    # (world frame, force at COM) so no separate jacobian pass is needed
    xf = cf.bf(data.xfrc_applied)  # (6, nb, B)
    f = m[None] * (a_com - g) - xf[:3] * dyn[None]
    Iw_om = _symv_c(J2, om)
    tau_b = _symv_c(J2, al0) + cf.cross_c(om, Iw_om) - xf[3:] * dyn[None]
    T = cf.cross_c(com, f) + tau_b

    # packed per-body payload -> per-dof subtree composites in one einsum
    mb = jnp.broadcast_to(m, (nb, B))
    mc = m[None] * com  # (3, nb, B)
    mcc = cf.dot_c(mc, com)  # (nb, B)
    S2 = jnp.stack(
        [
            mc[0] * com[0], mc[1] * com[1], mc[2] * com[2],
            mc[0] * com[1], mc[0] * com[2], mc[1] * com[2],
        ],
        axis=0,
    )
    payload = jnp.concatenate(
        [mb[None], mc, mcc[None], S2, J2, f, T], axis=0
    )  # (23, nb, B)
    anc = jnp.asarray(model.ancestor_mask, jnp.float32)  # (nb, nv)
    comp = jnp.einsum("nv,knb->kvb", anc, payload)  # (23, nv, B)
    mC = comp[0]  # (nv, B)
    mc_c = comp[1:4]
    trS = comp[4]
    S2_c = comp[5:11]
    J2_c = comp[11:17]
    Fc = comp[17:20]
    Tc = comp[20:23]

    # per-dof geometry (3, nv, B)
    a_d, anchor_d = dof_frames_cf(model, xpos_c, xquat_c)
    h = cf.cross_c(a_d, anchor_d)
    ir = jnp.asarray(model.dof_is_rot, jnp.float32)[None, :, None]  # (1, nv, 1)

    u1 = _symv_c(S2_c, a_d)
    u2 = cf.cross_c(a_d, mc_c)
    u3 = _symv_c(J2_c, a_d)
    w = cf.cross_c(mc_c, h)
    X = ir * (trS[None] * a_d - u1 - w + u3) + (1.0 - ir) * (-u2)
    Y = ir * (-u2 + mC[None] * h) + (1.0 - ir) * (-mC[None] * a_d)
    L6 = jnp.concatenate([a_d * ir, h * ir - a_d * (1.0 - ir)], axis=0)  # (6, nv, B)
    R6 = jnp.concatenate([X, Y], axis=0)
    M_low = jnp.einsum("kdb,keb->bde", L6, R6)
    DL, DLs = _crb_masks(model)
    M = M_low * jnp.asarray(DL) + jnp.swapaxes(M_low * jnp.asarray(DLs), 1, 2)

    irf = jnp.asarray(model.dof_is_rot, jnp.float32)[:, None]  # (nv, 1)
    qfrc_bias = irf * (cf.dot_c(a_d, Tc) - cf.dot_c(h, Fc)) + (
        1.0 - irf
    ) * cf.dot_c(a_d, Fc)
    return M, qfrc_bias.T


def _symv_c(S6: jax.Array, v: jax.Array) -> jax.Array:
    """Symmetric matvec, component-first: S6 (6, ..., B), v (3, ..., B)."""
    xx, yy, zz, xy, xz, yz = S6[0], S6[1], S6[2], S6[3], S6[4], S6[5]
    return jnp.stack(
        [
            xx * v[0] + xy * v[1] + xz * v[2],
            xy * v[0] + yy * v[1] + yz * v[2],
            xz * v[0] + yz * v[1] + zz * v[2],
        ],
        axis=0,
    )


@f32_matmuls
def mass_matrix_and_bias(model: Model, data: Data) -> Tuple[jax.Array, jax.Array]:
    """Batch-first convenience wrapper: recomputes component-form kinematics
    from data.qpos/qvel and delegates to mass_matrix_and_bias_cf."""
    from .kinematics import forward_kinematics_cf

    kin = forward_kinematics_cf(model, data.qpos, data.qvel)
    return mass_matrix_and_bias_cf(model, data, kin)


@f32_matmuls
def mass_matrix_and_bias_dense(
    model: Model, data: Data
) -> Tuple[jax.Array, jax.Array]:
    """Reference implementation via dense COM jacobians (slow; used by tests
    to cross-check the moment-based CRB path). Ignores xfrc_applied."""
    B = data.batch_size
    nb, nv = model.nbody, model.nv
    dof_axis, dof_anchor = dof_frames(model, data)
    jac_lin, jac_rot = body_jacobians(model, data, dof_axis, dof_anchor)  # (B, nb, nv, 3)

    mass = model.body_mass if model.body_mass.ndim == 2 else jnp.broadcast_to(model.body_mass, (B, nb))
    Iw = world_inertia(model, data)  # (B, nb, 3, 3)

    M = jnp.einsum("bndi,bn,bnei->bde", jac_lin, mass, jac_lin)
    M = M + jnp.einsum("bndi,bnij,bnej->bde", jac_rot, Iw, jac_rot)

    a0, al0 = bias_accelerations(model, data)
    com = body_com(model, data)
    rc_ = com - data.xpos
    om = data.cvel[:, :, 3:]
    a_com = a0 + jnp.cross(al0, rc_) + jnp.cross(om, jnp.cross(om, rc_))
    gc = model.body_gravcomp
    g = model.gravity * (1.0 - gc)[..., None]
    f_lin = mass[..., None] * (a_com - g)
    Iw_om = jnp.einsum("bnij,bnj->bni", Iw, om)
    f_rot = jnp.einsum("bnij,bnj->bni", Iw, al0) + jnp.cross(om, Iw_om)
    qfrc_bias = jnp.einsum("bndi,bni->bd", jac_lin, f_lin) + jnp.einsum(
        "bndi,bni->bd", jac_rot, f_rot
    )
    return M, qfrc_bias


def actuation(model: Model, data: Data) -> jax.Array:
    """PD drive torque (explicit part), clipped to force limits."""
    kp = model.drive_kp
    kd = model.drive_kd
    limit = model.drive_force_limit
    # joint-space positions for 1-dof joints live at q_adr aligned with dof;
    # builder guarantees qpos[dof_to_q] mapping via dof_q_adr
    q = joint_positions(model, data)
    tau = kp * (data.drive_target - q) + kd * (data.drive_vel_target - data.qvel)
    tau = jnp.clip(tau, -limit, limit)
    return tau


def joint_positions(model: Model, data: Data) -> jax.Array:
    """(B, nv) vector of per-dof positions (free-joint dofs read as 0)."""
    from .kinematics import fk_plan

    if model.nv == 0:
        return jnp.zeros((data.batch_size, 0), jnp.float32)
    plan = fk_plan(model)
    return data.qpos[:, plan.q_of_dof] * jnp.asarray(plan.q_mask)


@f32_matmuls
def smooth_dynamics(model: Model, data: Data, kin=None):
    """Compute the inverse LHS and the unconstrained velocity prediction.

    Returns (Minv (B,nv,nv) inverse of M_imp, qvel_pred (B,nv), qacc).
    External body wrenches (xfrc_applied) are folded into the CRB bias pass.
    ``kin`` is the component-form kinematics tuple from
    ``forward_kinematics_cf`` (recomputed from data if omitted).
    """
    from .kinematics import forward_kinematics_cf

    h = model.timestep
    if kin is None:
        kin = forward_kinematics_cf(model, data.qpos, data.qvel)
    M, qfrc_bias = mass_matrix_and_bias_cf(model, data, kin)
    tau = actuation(model, data) + data.qf_applied

    # passive joint springs (MJCF joint stiffness): explicit force +
    # implicit h^2*k on the diagonal for stability
    q = joint_positions(model, data)
    tau = tau - model.dof_stiffness * (q - model.dof_springref)

    # implicit terms on the diagonal: armature + h*(drive kd + dof damping
    # + h*spring stiffness)
    diag = model.dof_armature + h * (
        model.drive_kd + model.dof_damping + h * model.dof_stiffness
    )
    # kinematic FREE bodies own dofs that must not be integrated by dynamics;
    # they also carry zero rows in M (excluded from jacobians), so pin their
    # diagonal to keep the factorization SPD.
    kin_mask = _kinematic_dof_mask(model)
    diag = diag + kin_mask
    M_imp = M + _diag_embed(jnp.broadcast_to(diag, (data.batch_size, model.nv)))
    # explicit dof damping force (the implicit diag handles stability)
    tau = tau - model.dof_damping * data.qvel

    Minv = spd_inverse(M_imp)
    rhs = tau - qfrc_bias
    qacc = jnp.einsum("bij,bj->bi", Minv, rhs)
    qacc = qacc * (1.0 - kin_mask)
    qvel_pred = data.qvel + h * qacc
    return Minv, qvel_pred, qacc


def _diag_embed(d: jax.Array) -> jax.Array:
    n = d.shape[-1]
    out = jnp.zeros(d.shape + (n,), d.dtype)
    idx = jnp.arange(n)
    return out.at[..., idx, idx].set(d)


def spd_inverse(M: jax.Array) -> jax.Array:
    """Explicit inverse of small batched SPD matrices via unrolled Cholesky.

    ``jnp.linalg.cholesky``/``solve_triangular`` lower to sequential loops
    that cost ~9 ms at (4096, 21, 21) on TPU; unrolling the n (~20) column
    steps into fused VPU ops and materializing M^-1 = L^-T L^-1 makes every
    downstream solve a single MXU matmul.
    """
    import numpy as np

    n = M.shape[-1]
    # Jacobi equilibration: mass matrices mix scales (arm links ~5 kg m^2 vs
    # finger dofs ~1e-5), so f32 Cholesky cancellation noise (~eps*||M||)
    # can exceed the small pivots and go negative. Scale to unit diagonal
    # first; the scaled system's condition is only the coupling condition.
    idx = jnp.arange(n)
    dscale = jnp.sqrt(jnp.maximum(M[..., idx, idx], 1e-12))
    s = 1.0 / dscale  # (B, n)
    M = M * s[..., :, None] * s[..., None, :]

    # blocked recursive Cholesky + triangular inverse: sequential depth is
    # O(log^2 n) matmul-sized ops instead of O(n) rank-1 updates + O(n^2)
    # scalar row substitutions — the n~20 case compiles to ~a dozen fused
    # batched matmuls (MXU) rather than ~450 tiny VPU ops.
    L = _chol_blocked(M)
    Linv = _tri_inv_lower(L)
    Minv_scaled = jnp.einsum("...ki,...kj->...ij", Linv, Linv)  # L^-T L^-1
    # undo the equilibration: M^-1 = S (S M S)^-1 S
    return Minv_scaled * s[..., :, None] * s[..., None, :]


_CHOL_BASE = 4


def _chol_blocked(A: jax.Array) -> jax.Array:
    """Batched lower Cholesky by 2x2 block recursion."""
    n = A.shape[-1]
    if n <= _CHOL_BASE:
        # unrolled right-looking for the small base case
        cols = []
        mask_np = np.arange(n)
        for j in range(n):
            d = jnp.sqrt(jnp.maximum(A[..., j, j], 1e-9))
            col = A[..., :, j] / d[..., None]
            col = col * jnp.asarray(mask_np >= j, A.dtype)
            cols.append(col)
            A = A - col[..., :, None] * col[..., None, :]
        return jnp.stack(cols, axis=-1)
    k = n // 2
    A11 = A[..., :k, :k]
    A21 = A[..., k:, :k]
    A22 = A[..., k:, k:]
    L11 = _chol_blocked(A11)
    L11inv = _tri_inv_lower(L11)
    L21 = jnp.einsum("...ij,...kj->...ik", A21, L11inv)  # A21 L11^-T
    S = A22 - jnp.einsum("...ij,...kj->...ik", L21, L21)
    L22 = _chol_blocked(S)
    top = jnp.concatenate([L11, jnp.zeros_like(A[..., :k, k:])], axis=-1)
    bot = jnp.concatenate([L21, L22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _tri_inv_lower(L: jax.Array) -> jax.Array:
    """Batched inverse of a lower-triangular matrix by block recursion."""
    n = L.shape[-1]
    if n == 1:
        return 1.0 / L
    if n <= _CHOL_BASE:
        # unrolled forward substitution for the base case
        rows = []
        eye = jnp.eye(n, dtype=L.dtype)
        for i in range(n):
            acc = jnp.broadcast_to(eye[i], L.shape[:-2] + (n,))
            for kk in range(i):
                acc = acc - L[..., i, kk][..., None] * rows[kk]
            rows.append(acc / L[..., i, i][..., None])
        return jnp.stack(rows, axis=-2)
    k = n // 2
    Ai = _tri_inv_lower(L[..., :k, :k])
    Di = _tri_inv_lower(L[..., k:, k:])
    X = -jnp.einsum("...ij,...jk,...kl->...il", Di, L[..., k:, :k], Ai)
    top = jnp.concatenate([Ai, jnp.zeros_like(L[..., :k, k:])], axis=-1)
    bot = jnp.concatenate([X, Di], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _kinematic_dof_mask(model: Model) -> jax.Array:
    import numpy as np

    mask = np.zeros(model.nv, np.float32)
    for b in range(model.nbody):
        if model.body_type[b] == 1:  # KINEMATIC
            va = int(model.body_dof_adr[b])
            nvj = {0: 6, 1: 1, 2: 1, 3: 0}[int(model.body_jnt_type[b])]
            mask[va : va + nvj] = 1.0
    return jnp.asarray(mask)


def cho_solve(chol: jax.Array, rhs: jax.Array) -> jax.Array:
    """Batched triangular solve with lower-Cholesky factor; rhs (B, nv) or (B, nv, k)."""
    vec = rhs.ndim == chol.ndim - 1
    if vec:
        rhs = rhs[..., None]
    y = jax.scipy.linalg.solve_triangular(chol, rhs, lower=True)
    x = jax.scipy.linalg.solve_triangular(
        jnp.swapaxes(chol, -1, -2), y, lower=False
    )
    return x[..., 0] if vec else x

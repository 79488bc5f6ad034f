"""Velocity-level contact/limit impulse solver.

Replaces PhysX's TGS solver (SURVEY.md §2.1) with a batched projected-Jacobi
iteration on the Delassus operator A = J M⁻¹ Jᵀ. Nothing is sequential per
contact: every iteration is two batched (B, rows, nv) matmuls (MXU-friendly),
so the whole solve vmaps/shards over the env axis trivially — this is the
TPU-native trade: more, cheaper iterations instead of PhysX's serialized
Gauss-Seidel sweeps.

Constraint rows:
- per contact point: 1 normal row (λ ≥ 0, Baumgarte positional bias) + 2
  friction rows (|λ_t| ≤ μ λ_n, box-projected cone).
- per limited dof: 1 unilateral row pushing back inside the limit range
  (PhysX joint-limit equivalent).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .types import Contact, Data, Model, FREE, HINGE, SLIDE
from .dynamics import cho_solve, joint_positions
from .kinematics import dof_frames, point_jacobian


def _tangent_basis(n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Two unit tangents orthogonal to n (branch-free)."""
    # pick the world axis least aligned with n
    a = jnp.where(
        (jnp.abs(n[..., 0:1]) < 0.9),
        jnp.broadcast_to(jnp.array([1.0, 0, 0], n.dtype), n.shape),
        jnp.broadcast_to(jnp.array([0, 1.0, 0], n.dtype), n.shape),
    )
    t1 = jnp.cross(n, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(n, t1)
    return t1, t2


def contact_jacobians(model: Model, data: Data, contact: Contact) -> jax.Array:
    """Relative-velocity Jacobian per contact: (B, C, nv, 3).

    v_rel = J^T qvel = v(body2 at p) - v(body1 at p).
    """
    B = data.batch_size
    C = contact.pos.shape[1]
    if C == 0:
        return jnp.zeros((B, 0, model.nv, 3), jnp.float32)
    dof_axis, dof_anchor = dof_frames(model, data)  # (B, nv, 3)

    # per-dof column at each contact point (independent of which body):
    # rot dof: axis x (p - anchor); trans dof: axis
    rel = contact.pos[:, :, None, :] - dof_anchor[:, None, :, :]  # (B, C, nv, 3)
    col = jnp.where(
        jnp.asarray(model.dof_is_rot)[None, None, :, None],
        jnp.cross(jnp.broadcast_to(dof_axis[:, None], rel.shape), rel),
        jnp.broadcast_to(dof_axis[:, None], rel.shape),
    )

    b1 = model.geom_body[contact.geom1]  # (C,) static numpy
    b2 = model.geom_body[contact.geom2]
    dyn = (model.body_type == 0).astype(np.float32)  # (nbody,)
    m1 = model.ancestor_mask[b1] * dyn[b1][:, None]  # (C, nv)
    m2 = model.ancestor_mask[b2] * dyn[b2][:, None]
    w = jnp.asarray(m2 - m1, jnp.float32)[None, :, :, None]  # (1, C, nv, 1)
    return col * w


def limit_rows(model: Model, data: Data):
    """Unilateral joint-limit rows: (J (B, L, nv), depth (B, L)).

    One row per limited dof; the active side (lower/upper) is chosen
    branch-free by proximity. J = ±e_d so a positive impulse pushes the dof
    back into range.
    """
    lim_dofs = np.nonzero(model.dof_limited)[0]
    B = data.batch_size
    L = len(lim_dofs)
    if L == 0:
        return jnp.zeros((B, 0, model.nv), jnp.float32), jnp.zeros((B, 0), jnp.float32)
    q = joint_positions(model, data)  # (B, nv)
    lo = model.dof_limit[..., 0]
    hi = model.dof_limit[..., 1]
    rows, depths = [], []
    for d in lim_dofs:
        d = int(d)
        dist_lo = q[:, d] - lo[..., d]
        dist_hi = hi[..., d] - q[:, d]
        use_lo = dist_lo < dist_hi
        sign = jnp.where(use_lo, 1.0, -1.0)
        depth = -jnp.where(use_lo, dist_lo, dist_hi)  # >0 when violated
        e = jnp.zeros((B, model.nv), jnp.float32).at[:, d].set(sign)
        rows.append(e)
        depths.append(depth)
    return jnp.stack(rows, axis=1), jnp.stack(depths, axis=1)


def solve(
    model: Model,
    data: Data,
    Minv: jax.Array,
    qvel_pred: jax.Array,
    contact: Contact,
) -> Tuple[jax.Array, Contact]:
    """Returns (qvel_new (B, nv), contact with impulses filled)."""
    B = data.batch_size
    h = model.timestep
    C_full = contact.pos.shape[1]

    # --- active-contact compaction: the candidate set is static and large,
    # the active set is small. Gather the K deepest candidates per env and
    # solve only those rows (solver cost scales with K, not C_full).
    K = model.max_active_contacts
    compact = 0 < K < C_full
    dyn = (model.body_type == 0).astype(np.float32)
    b1 = model.geom_body[contact.geom1]
    b2 = model.geom_body[contact.geom2]
    w_full = jnp.asarray(
        (model.ancestor_mask[b2] * dyn[b2][:, None])
        - (model.ancestor_mask[b1] * dyn[b1][:, None]),
        jnp.float32,
    )  # (C_full, nv)
    prev_ok = (
        data.contact is not None and data.contact.impulse.shape[1] == C_full
    )
    if compact:
        cdepth, idx = jax.lax.top_k(contact.depth, K)  # (B, K)
        g3 = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1)
        cpos = g3(contact.pos)
        cnormal = g3(contact.normal)
        cmu = jnp.take_along_axis(contact.friction, idx, axis=1)
        w = jnp.take(w_full, idx, axis=0)  # (B, K, nv)
        prev_imp = g3(data.contact.impulse) if prev_ok else None
        C = K
    else:
        cdepth, cpos, cnormal, cmu = (
            contact.depth, contact.pos, contact.normal, contact.friction,
        )
        w = w_full[None]
        prev_imp = data.contact.impulse if prev_ok else None
        C = C_full

    # relative-velocity jacobian at the (possibly compacted) contact points
    dof_axis, dof_anchor = dof_frames(model, data)  # (B, nv, 3)
    rel = cpos[:, :, None, :] - dof_anchor[:, None, :, :]  # (B, C, nv, 3)
    col = jnp.where(
        jnp.asarray(model.dof_is_rot)[None, None, :, None],
        jnp.cross(jnp.broadcast_to(dof_axis[:, None], rel.shape), rel),
        jnp.broadcast_to(dof_axis[:, None], rel.shape),
    )
    jrel = col * w[..., None]  # (B, C, nv, 3)

    t1, t2 = _tangent_basis(cnormal)
    basis = jnp.stack([cnormal, t1, t2], axis=2)  # (B, C, 3, 3)
    # build J directly in (B, nv, R) layout: R (the long axis, ~100s of rows)
    # rides the TPU lane dimension; nv (~20) stays in sublanes. The iteration
    # matvecs then read at full lane utilization instead of nv/128.
    Jc_t = jnp.einsum("bcvk,bcik->bvci", jrel, basis)  # (B, nv, C, 3)
    Jc_t = Jc_t.reshape(B, model.nv, C * 3)

    Jl, limit_depth = limit_rows(model, data)  # (B, L, nv), (B, L)
    L = Jl.shape[1]
    Jt = jnp.concatenate([Jc_t, jnp.swapaxes(Jl, 1, 2)], axis=2)  # (B, nv, R)
    R = C * 3 + L

    if R == 0:
        return qvel_pred, contact

    active_c = cdepth > -model.contact_margin  # (B, C)
    arow = jnp.concatenate(
        [jnp.repeat(active_c, 3, axis=1), limit_depth > -0.01], axis=1
    )  # (B, R)
    Jt = Jt * arow[:, None, :]

    # W = M^-1 J^T  (B, nv, R) — one MXU matmul with the explicit inverse
    W = jnp.einsum("bij,bjr->bir", Minv, Jt)
    diag_A = jnp.einsum("bvr,bvr->br", Jt, W)
    inv_diag = jnp.where(diag_A > 1e-9, 1.0 / jnp.maximum(diag_A, 1e-9), 0.0)

    # velocity bias: push out at beta/h * depth, capped
    bias_c = jnp.clip(
        model.baumgarte / h * jnp.maximum(cdepth - model.contact_slop, 0.0),
        0.0,
        model.max_correction_vel,
    )
    bias_l = jnp.clip(
        model.baumgarte / h * jnp.maximum(limit_depth, 0.0), 0.0, model.max_correction_vel
    )
    target = jnp.zeros((B, C, 3), jnp.float32).at[..., 0].set(bias_c).reshape(B, C * 3)
    target = jnp.concatenate([target, bias_l], axis=1)  # (B, R)

    v0 = jnp.einsum("bvr,bv->br", Jt, qvel_pred)
    mu = cmu

    def project(lam):
        cap_hi = model.max_impulse
        if C > 0:
            lc = lam[:, : C * 3].reshape(B, C, 3)
            ln = jnp.clip(lc[..., 0], 0.0, cap_hi)
            cap = mu * ln
            lt1 = jnp.clip(lc[..., 1], -cap, cap)
            lt2 = jnp.clip(lc[..., 2], -cap, cap)
            lc = jnp.stack([ln, lt1, lt2], axis=-1).reshape(B, C * 3)
        else:
            lc = lam[:, :0]
        ll = jnp.clip(lam[:, C * 3 :], 0.0, cap_hi)
        return jnp.concatenate([lc, ll], axis=1)

    def matvec(x):
        dv = jnp.einsum("bvr,br->bv", W, x)
        return jnp.einsum("bvr,bv->br", Jt, dv)

    # Jacobi with D^-1 preconditioning diverges once contact rows couple
    # strongly (stacking, multi-point manifolds): the iteration matrix
    # I - D^-1 A needs rho < 1 which redundant rows break. Estimate
    # rho(D^-1 A) by power iteration and step with omega = 1/rho —
    # a projected-gradient method with a certified-stable step, all batched
    # (no per-contact serialization, unlike PhysX's Gauss-Seidel).
    def pw_body(i, x):
        y = inv_diag * matvec(x)
        norm = jnp.linalg.norm(y, axis=-1, keepdims=True)
        return y / jnp.maximum(norm, 1e-12)

    x0 = arow.astype(jnp.float32)
    x0 = x0 / jnp.maximum(jnp.linalg.norm(x0, axis=-1, keepdims=True), 1e-12)
    x = jax.lax.fori_loop(0, 8, pw_body, x0)
    y = inv_diag * matvec(x)
    rho = jnp.sum(x * y, axis=-1, keepdims=True)  # Rayleigh quotient
    omega = 0.9 / jnp.maximum(rho, 1.0)

    def body(i, lam):
        # residual r = A lam + (v0 - target)
        r = matvec(lam) + v0 - target
        lam = lam - omega * inv_diag * r
        return project(lam)

    # warm start: contacts keep their candidate-list identity across steps
    # (compaction gathers the previous impulses at the same candidate ids),
    # so the previous step's impulses project straight onto the new basis —
    # the PhysX-style convergence win for persistent contacts.
    if prev_imp is not None and C > 0:
        lam_c0 = jnp.einsum("bcik,bck->bci", basis, prev_imp).reshape(B, C * 3)
        lam0 = jnp.concatenate([lam_c0, jnp.zeros((B, L), jnp.float32)], axis=1)
        # inactive rows have inv_diag == 0 and would carry a frozen (phantom)
        # warm-start impulse through the iteration and back into reporting;
        # mask them out up front.
        lam0 = project(lam0) * arow
    else:
        lam0 = jnp.zeros((B, R), jnp.float32)
    lam = jax.lax.fori_loop(0, model.solver_iterations, body, lam0)
    lam = lam * arow  # deactivated rows report zero impulse

    qvel_new = qvel_pred + jnp.einsum("bvr,br->bv", W, lam)

    if C > 0:
        lam_c = lam[:, : C * 3].reshape(B, C, 3)
        impulse = jnp.einsum("bcik,bci->bck", basis, lam_c)  # world impulse on body2
        if compact:
            full = jnp.zeros((B, C_full, 3), jnp.float32)
            full = full.at[jnp.arange(B)[:, None], idx].set(impulse)
            contact = contact.replace(impulse=full)
        else:
            contact = contact.replace(impulse=impulse)
    return qvel_new, contact

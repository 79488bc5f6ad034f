"""Velocity-level contact/limit impulse solver.

Replaces PhysX's TGS solver (SURVEY.md §2.1) with a batched projected-gradient
iteration on the Delassus operator A = J M⁻¹ Jᵀ. Nothing is sequential per
contact: every iteration is two batched (B, nv, R) matvecs (MXU-friendly), so
the whole solve vmaps/shards over the env axis trivially — this is the
TPU-native trade: more, cheaper iterations instead of PhysX's serialized
Gauss-Seidel sweeps.

HBM discipline (the solver is bandwidth-bound, not FLOP-bound):
- The contact jacobian is assembled directly in (B, nv, R) layout from
  per-dof 3-vectors and per-row 3-vectors via ONE batched (B,nv,6)x(B,6,R)
  contraction (scalar-triple-product identity), never materializing the
  (B, C, nv, 3) per-contact jacobian tensor.
- The iteration matvecs read bf16 copies of J and W (f32 accumulation on the
  MXU); the final velocity update uses the f32 operands.

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
from .types import f32_matmuls
from .dynamics import joint_positions
from .kinematics import dof_frames


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

    v_rel = J^T qvel = v(body2 at p) - v(body1 at p). (Dense reference form —
    the solver itself uses the factored build below.)
    """
    B = data.batch_size
    C = contact.pos.shape[1]
    if C == 0:
        return jnp.zeros((B, 0, model.nv, 3), jnp.float32)
    dof_axis, dof_anchor = dof_frames(model, data)  # (B, nv, 3)

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
    """Unilateral joint-limit rows, fully vectorized.

    Returns (sign (B, L), depth (B, L), lim_dofs (L,) static). Row d's
    jacobian is sign * e_{lim_dofs[d]}; the active side (lower/upper) is
    chosen branch-free by proximity. A positive impulse pushes the dof back
    into range.
    """
    lim_dofs = np.nonzero(model.dof_limited)[0].astype(np.int32)
    B = data.batch_size
    L = len(lim_dofs)
    if L == 0:
        z = jnp.zeros((B, 0), jnp.float32)
        return z, z, lim_dofs
    q = joint_positions(model, data)[:, lim_dofs]  # (B, L)
    lo = model.dof_limit[..., lim_dofs, 0]
    hi = model.dof_limit[..., lim_dofs, 1]
    dist_lo = q - lo
    dist_hi = hi - q
    use_lo = dist_lo < dist_hi
    sign = jnp.where(use_lo, 1.0, -1.0)
    depth = -jnp.where(use_lo, dist_lo, dist_hi)  # >0 when violated
    return jnp.broadcast_to(sign, (B, L)), jnp.broadcast_to(depth, (B, L)), lim_dofs


@f32_matmuls
def solve(
    model: Model,
    data: Data,
    Minv: jax.Array,
    qvel_pred: jax.Array,
    contact: Contact,
    kin=None,
) -> Tuple[jax.Array, Contact]:
    """Returns (qvel_new (B, nv), contact with impulses filled)."""
    B = data.batch_size
    nv = model.nv
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
    crest_full = (
        contact.restitution
        if contact.restitution is not None
        else jnp.zeros_like(contact.friction)
    )
    oh = None
    if compact:
        cdepth, idx = jax.lax.top_k(contact.depth, K)  # (B, K)
        # gather-as-matmul: a dynamic gather with a batch dim lowers to a
        # scalar loop on TPU (~5 ms at B=4096 here); a one-hot contraction
        # rides the MXU instead and is exact under "highest" precision
        # (exactly one unit weight per output row).
        oh = (idx[..., None] == jnp.arange(C_full)[None, None, :]).astype(
            jnp.float32
        )  # (B, K, C_full)
        packed = [contact.pos, contact.normal,
                  contact.friction[..., None], crest_full[..., None]]
        if prev_ok:
            packed.append(data.contact.impulse)
        gk = jnp.einsum("bkc,bcx->bkx", oh, jnp.concatenate(packed, axis=-1))
        cpos, cnormal = gk[..., 0:3], gk[..., 3:6]
        cmu, crest = gk[..., 6], gk[..., 7]
        prev_imp = gk[..., 8:11] if prev_ok else None
        w = jnp.einsum("bkc,cv->bkv", oh, w_full)  # (B, K, nv)
        C = K
    else:
        cdepth, cpos, cnormal, cmu = (
            contact.depth, contact.pos, contact.normal, contact.friction,
        )
        crest = crest_full
        w = w_full[None]
        prev_imp = data.contact.impulse if prev_ok else None
        C = C_full

    sl_sign, limit_depth, lim_dofs = limit_rows(model, data)
    L = len(lim_dofs)
    R = C * 3 + L
    if R == 0:
        return qvel_pred, contact

    # --- contact jacobian directly in (B, nv, R) layout -------------------
    # Row (c,i) has direction e = basis_i(c) at point p_c. For a rotational
    # dof (axis a, anchor q): J = a.(p x e) - e.(a x q); translational: a.e.
    # Scalar-triple-product form -> one (B,nv,6)x(B,6,3C) contraction with
    # left factors premasked by dof type:
    #   J = [a*ir | a*(1-ir) - h*ir] @ [[p x e],[e]],  h = a x q.
    if C > 0:
        t1, t2 = _tangent_basis(cnormal)
        # U (B, 3, 3C): basis direction components, rows (c,i) flattened
        # i-fastest to match the (C, 3)->3C reshape used everywhere else
        def rows3(v):
            # v (B, C, 3) -> (B, 3, C) component-first
            return jnp.swapaxes(v, 1, 2)

        # interleave (n, t1, t2) on the row axis: (B, 3k, C, 3i) is avoided;
        # build (B, 3, C*3) by stacking on a new minor axis then reshaping
        U = jnp.stack([rows3(cnormal), rows3(t1), rows3(t2)], axis=-1)  # (B,3,C,3)
        U = U.reshape(B, 3, C * 3)
        P = jnp.broadcast_to(rows3(cpos)[..., None], (B, 3, C, 3)).reshape(
            B, 3, C * 3
        )
        Mx = jnp.cross(P, U, axis=1)  # p x e per row, (B, 3, 3C)

        if kin is not None:
            from . import cf
            from .kinematics import dof_frames_cf

            ax_c, an_c = dof_frames_cf(model, kin[0], kin[1])
            dof_axis, dof_anchor = cf.fb(ax_c), cf.fb(an_c)
        else:
            dof_axis, dof_anchor = dof_frames(model, data)  # (B, nv, 3)
        hvec = jnp.cross(dof_axis, dof_anchor)
        ir = jnp.asarray(model.dof_is_rot, jnp.float32)[None, :, None]
        Lf = jnp.concatenate(
            [dof_axis * ir, dof_axis * (1.0 - ir) - hvec * ir], axis=-1
        )  # (B, nv, 6)
        Rf = jnp.concatenate([Mx, U], axis=1)  # (B, 6, 3C)
        Jc = jnp.einsum("bvk,bkr->bvr", Lf, Rf)  # (B, nv, 3C)
        # ancestor/sign mask per (contact, dof), repeated over the 3 rows
        w_t = jnp.repeat(jnp.swapaxes(jnp.broadcast_to(w, (B, C, nv)), 1, 2), 3, axis=2)
        Jc = Jc * w_t
    else:
        Jc = jnp.zeros((B, nv, 0), jnp.float32)

    # limit rows: J = sign * e_d -> scatter sign into (B, nv, L)
    if L > 0:
        Jl_t = jnp.zeros((B, nv, L), jnp.float32).at[
            :, lim_dofs, jnp.arange(L)
        ].set(sl_sign)
        Jt = jnp.concatenate([Jc, Jl_t], axis=2)  # (B, nv, R)
    else:
        Jt = Jc

    active_c = cdepth > -model.contact_margin  # (B, C)
    arow = jnp.concatenate(
        [jnp.repeat(active_c, 3, axis=1), limit_depth > -0.01], axis=1
    )  # (B, R)
    Jt = Jt * arow[:, None, :]

    # W = M^-1 J^T  (B, nv, R) — one MXU matmul with the explicit inverse
    W = jnp.einsum("bij,bjr->bir", Minv, Jt)
    diag_A = jnp.einsum("bvr,bvr->br", Jt, W)
    inv_diag = jnp.where(diag_A > 1e-9, 1.0 / jnp.maximum(diag_A, 1e-9), 0.0)

    # velocity bias: penetrating rows push out at beta/h * depth (capped);
    # separated rows within the margin are SPECULATIVE — they may approach
    # at up to gap/h (closing the gap this step) but not penetrate. This
    # keeps rows (and their warm-started impulses) alive across the
    # micro-separations of a squeezing grasp instead of chattering on/off.
    bias_c = jnp.where(
        cdepth >= 0.0,
        jnp.clip(
            model.baumgarte / h * jnp.maximum(cdepth - model.contact_slop, 0.0),
            0.0,
            model.max_correction_vel,
        ),
        cdepth / h,
    )
    bias_l = jnp.where(
        limit_depth >= 0.0,
        jnp.clip(
            model.baumgarte / h * limit_depth, 0.0, model.max_correction_vel
        ),
        limit_depth / h,
    )
    v0 = jnp.einsum("bvr,bv->br", Jt, qvel_pred)
    mu = cmu

    # restitution (DefaultMaterialsConfig.restitution parity): rows
    # approaching faster than bounce_threshold rebound at e * approach speed
    # — the target normal velocity is raised above the Baumgarte push-out
    if C > 0:
        v_n0 = v0[:, : C * 3].reshape(B, C, 3)[..., 0]  # pre-solve normal vel
        approach = jnp.maximum(-v_n0, 0.0)
        bounce = jnp.where(
            approach > model.bounce_threshold, crest * approach, 0.0
        )
        # only raise the target where a bounce is active — speculative
        # (separated) rows keep their negative approach-allowance targets
        bias_c = jnp.where(bounce > 0.0, jnp.maximum(bias_c, bounce), bias_c)
    target = jnp.zeros((B, C, 3), jnp.float32).at[..., 0].set(bias_c).reshape(B, C * 3)
    target = jnp.concatenate([target, bias_l], axis=1)  # (B, R)

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

    # bf16 operands for the iteration matvecs (f32 accumulation on the MXU):
    # halves the dominant HBM traffic; the projection/clipping stays f32
    W16 = W.astype(jnp.bfloat16)
    Jt16 = Jt.astype(jnp.bfloat16)

    def matvec(x):
        dv = jnp.einsum(
            "bvr,br->bv", W16, x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return jnp.einsum(
            "bvr,bv->br", Jt16, dv.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )

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
    # 4 iterations put the Rayleigh quotient within a few % of rho for these
    # small clustered spectra; the 0.85 safety margin absorbs the remainder
    # (each power step costs the same matvec as a solver iteration).
    x = jax.lax.fori_loop(0, 4, pw_body, x0)
    y = inv_diag * matvec(x)
    rho = jnp.sum(x * y, axis=-1, keepdims=True)  # Rayleigh quotient
    omega = 0.85 / jnp.maximum(rho, 1.0)

    def body(i, carry):
        # APGD (accelerated projected gradient, Nesterov momentum): the
        # gradient step runs at the extrapolated point y, which cuts the
        # iteration count ~2x vs plain PGD for the same residual — per
        # iteration it is still ONE batched matvec pair. Momentum schedule
        # beta_k = k/(k+3), with a per-env gradient restart
        # (O'Donoghue & Candes): if the 4-step power iteration underestimates
        # rho, Nesterov momentum can diverge where plain PGD would not —
        # resetting the momentum counter whenever the update direction
        # opposes progress restores monotone-ish convergence at the cost of
        # one extra dot product per iteration.
        lam_prev, y, k = carry
        r = matvec(y) + v0 - target
        lam = project(y - omega * inv_diag * r)
        restart = (
            jnp.sum((y - lam) * (lam - lam_prev), axis=-1, keepdims=True) > 0.0
        )
        k = jnp.where(restart, 0.0, k + 1.0)  # (B, 1)
        beta = k / (k + 3.0)
        y = lam + beta * (lam - lam_prev)
        return lam, y, k

    # warm start: contacts keep their candidate-list identity across steps
    # (compaction gathers the previous impulses at the same candidate ids),
    # so the previous step's impulses project straight onto the new basis —
    # the PhysX-style convergence win for persistent contacts.
    if prev_imp is not None and C > 0:
        basis = jnp.stack([cnormal, t1, t2], axis=2)  # (B, C, 3, 3)
        lam_c0 = jnp.einsum("bcik,bck->bci", basis, prev_imp).reshape(B, C * 3)
        lam0 = jnp.concatenate([lam_c0, jnp.zeros((B, L), jnp.float32)], axis=1)
        # inactive rows have inv_diag == 0 and would carry a frozen (phantom)
        # warm-start impulse through the iteration and back into reporting;
        # mask them out up front.
        lam0 = project(lam0) * arow
    else:
        lam0 = jnp.zeros((B, R), jnp.float32)
    k0 = jnp.zeros((B, 1), jnp.float32)
    lam, _, _ = jax.lax.fori_loop(
        0, model.solver_iterations, body, (lam0, lam0, k0)
    )
    lam = lam * arow  # deactivated rows report zero impulse

    qvel_new = qvel_pred + jnp.einsum("bvr,br->bv", W, lam)

    if C > 0:
        lam_c = lam[:, : C * 3].reshape(B, C, 3)
        basis = jnp.stack([cnormal, t1, t2], axis=2)  # (B, C, 3, 3)
        impulse = jnp.einsum("bcik,bci->bck", basis, lam_c)  # world impulse on body2
        if compact:
            # scatter-as-matmul (transpose of the gather above)
            full = jnp.einsum("bkc,bki->bci", oh, impulse)
            # truncation counter: live candidates NOT among the K gathered.
            # Observable via data.contact.overflow — nonzero means top-K
            # compaction silently dropped real contacts this step.
            n_live = jnp.sum(contact.depth > 0.0, axis=1)
            overflow = jnp.maximum(n_live - K, 0).astype(jnp.int32)
            contact = contact.replace(impulse=full, overflow=overflow)
        else:
            contact = contact.replace(
                impulse=impulse,
                overflow=jnp.zeros((B,), jnp.int32),
            )
    return qvel_new, contact

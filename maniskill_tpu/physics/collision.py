"""Batched analytic narrowphase for primitive geoms.

Replaces PhysX's PCM/convex collision (SURVEY.md §2.1) with static-shape,
branch-free contact generation: every candidate pair (precomputed at model
build — the compile-time analog of PhysX's found_lost_pairs_capacity) expands
to a *fixed* number of candidate contact points; invalid points carry
depth << 0 and are masked in the solver. All functions are batched over envs.

Conventions:
- ``normal`` points from geom1 toward geom2 = the direction to push geom2 to
  separate. Impulse +λ·n acts on body(geom2), −λ·n on body(geom1).
- ``depth`` > 0 means penetration.
- Pairs are ordered so geom_type[g1] <= geom_type[g2].
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import rotation_conversions as rc
from .types import BOX, CAPSULE, CYLINDER, HULL, PLANE, SPHERE, Contact, Data, HArray, Model
from .types import f32_matmuls
from .kinematics import geom_poses

# A contact candidate: (pos (B,3), normal (B,3), depth (B,))
Cand = Tuple[jax.Array, jax.Array, jax.Array]

BAD_DEPTH = -1e6

# speculative-contact margin: candidates within this separation stay live
# (negative depth) so the solver keeps persistent rows + warm starts across
# micro-separations. Must cover Model.contact_margin (types.py).
MARGIN = 0.012


def _to_local(p, gpos, gquat):
    return rc.quaternion_apply(rc.quaternion_conjugate(gquat), p - gpos)


def _from_local_dir(d, gquat):
    return rc.quaternion_apply(gquat, d)


def _box_sdf_local(p: jax.Array, half: jax.Array):
    """Signed distance + outward normal of a box at local point(s) p.

    p: (..., 3), half: (..., 3). Returns (dist (...,), normal (..., 3)).
    """
    q = jnp.abs(p) - half
    outside = jnp.maximum(q, 0.0)
    dist_out = jnp.linalg.norm(outside, axis=-1)
    max_q = jnp.max(q, axis=-1)
    dist_in = jnp.minimum(max_q, 0.0)
    dist = dist_out + dist_in

    # outward normal: outside -> gradient of ||max(q,0)||; inside -> axis of
    # least penetration, signed by the point's octant.
    n_out = outside / jnp.maximum(dist_out[..., None], 1e-9)
    axis = jnp.argmax(q, axis=-1)
    n_in = jax.nn.one_hot(axis, 3, dtype=p.dtype)
    n = jnp.where((dist_out > 0.0)[..., None], n_out, n_in)
    n = n * jnp.sign(jnp.where(p == 0.0, 1.0, p))
    # renormalize (sign() can zero a component exactly on a face center)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    return dist, n


def _plane_normal(gquat):
    z = jnp.zeros_like(gquat[..., :3]).at[..., 2].set(1.0)
    return rc.quaternion_apply(gquat, z)


def _plane_height(p, gpos, n):
    """Signed height of point(s) above the plane."""
    return jnp.sum((p - gpos) * n, axis=-1)


def plane_sphere(p1, q1, s1, p2, q2, s2) -> List[Cand]:
    n = _plane_normal(q1)
    r = s2[..., 0]
    h = _plane_height(p2, p1, n)
    depth = r - h
    pos = p2 - n * h[..., None]
    return [(pos, n, depth)]


def plane_box(p1, q1, s1, p2, q2, s2) -> List[Cand]:
    """Keep only the 4 deepest of the 8 corners (a face manifold needs 4;
    fewer rows = less solver bandwidth)."""
    n = _plane_normal(q1)
    cs, ds = [], []
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                corner_l = s2 * jnp.asarray([sx, sy, sz], s2.dtype)
                corner = p2 + rc.quaternion_apply(q2, corner_l)
                cs.append(corner)
                ds.append(-_plane_height(corner, p1, n))
    depth8 = jnp.stack(ds, axis=-1)  # (..., 8)
    corner8 = jnp.stack(cs, axis=-2)  # (..., 8, 3)
    top_d, top_i = jax.lax.top_k(depth8, 4)
    top_c = jnp.take_along_axis(corner8, top_i[..., None].astype(jnp.int32), axis=-2)
    return [(top_c[..., i, :], n, top_d[..., i]) for i in range(4)]


def plane_capsule(p1, q1, s1, p2, q2, s2) -> List[Cand]:
    n = _plane_normal(q1)
    r, hl = s2[..., 0], s2[..., 1]
    axis = rc.quaternion_apply(q2, jnp.zeros_like(p2).at[..., 2].set(1.0))
    out = []
    for sgn in (-1.0, 1.0):
        end = p2 + axis * (sgn * hl)[..., None]
        h = _plane_height(end, p1, n)
        out.append((end - n * h[..., None], n, r - h))
    return out


def plane_cylinder(p1, q1, s1, p2, q2, s2) -> List[Cand]:
    """Sample 4 rim points per cap (8 candidates)."""
    n = _plane_normal(q1)
    r, hl = s2[..., 0:1], s2[..., 1:2]
    R = rc.quaternion_to_matrix(q2)
    ax, ay, az = R[..., :, 0], R[..., :, 1], R[..., :, 2]
    # radial direction most aligned with -n (deepest) plus 3 more around
    out = []
    for sgn in (-1.0, 1.0):
        cap = p2 + az * (sgn * hl)
        for ca, cb in ((1.0, 0.0), (-1.0, 0.0), (0.0, 1.0), (0.0, -1.0)):
            pt = cap + ax * (r * ca) + ay * (r * cb)
            h = _plane_height(pt, p1, n)
            out.append((pt, n, -h))
    return out


def sphere_sphere(p1, q1, s1, p2, q2, s2) -> List[Cand]:
    d = p2 - p1
    dist = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dist[..., None], 1e-9)
    depth = s1[..., 0] + s2[..., 0] - dist
    pos = p1 + n * (s1[..., 0:1] - 0.5 * depth[..., None])
    return [(pos, n, depth)]


def _sphere_vs_box(center, radius, bp, bq, bs) -> Cand:
    """Sphere (geom1-side) vs box (geom2-side): normal pushes the BOX away."""
    local = _to_local(center, bp, bq)
    dist, n_l = _box_sdf_local(local, bs)
    depth = radius - dist
    n_w = _from_local_dir(n_l, bq)
    # n_w points from box surface toward sphere center; push box the other way
    pos = center - n_w * jnp.clip(dist, -radius, radius)[..., None]
    return (pos, -n_w, depth)


def sphere_box(p1, q1, s1, p2, q2, s2) -> List[Cand]:
    return [_sphere_vs_box(p1, s1[..., 0], p2, q2, s2)]


def sphere_capsule(p1, q1, s1, p2, q2, s2) -> List[Cand]:
    r2, hl = s2[..., 0], s2[..., 1]
    axis = rc.quaternion_apply(q2, jnp.zeros_like(p2).at[..., 2].set(1.0))
    t = jnp.clip(jnp.sum((p1 - p2) * axis, axis=-1), -hl, hl)
    c = p2 + axis * t[..., None]
    d = c - p1
    dist = jnp.linalg.norm(d, axis=-1)
    n = d / jnp.maximum(dist[..., None], 1e-9)
    depth = s1[..., 0] + r2 - dist
    pos = p1 + n * (s1[..., 0:1] - 0.5 * depth[..., None])
    return [(pos, n, depth)]


def box_box(p1, q1, s1, p2, q2, s2) -> List[Cand]:
    """Box-box via face-axis SAT normal + reference-face clip manifold.

    The separating-axis test over the 6 face normals picks ONE consistent
    contact normal (the minimum-overlap axis). The manifold is the classic
    face-clip construction (what PhysX/MuJoCo do for box stacks): project the
    incident face onto the reference face plane, then emit
      - the 4 incident-face corners clamped into the reference face rect, and
      - the 4 reference face rect corners that lie inside the projected
        incident face,
    with depth taken from the incident-plane equation at each point. This
    covers the full intersection patch — in particular a gripper pad whose
    face overhangs the grasped box still gets contact points along the box's
    edge, so pinch grips resist roll (raw corner containment degenerates to a
    1-2 point line contact there and the grasped object rolls out).
    Edge-edge cases are approximated by the clamped corners. 8 static rows.
    """
    R1 = rc.quaternion_to_matrix(q1)  # (..., 3, 3), columns = box axes
    R2 = rc.quaternion_to_matrix(q2)
    d = p2 - p1  # (..., 3)

    axes = [R1[..., :, i] for i in range(3)] + [R2[..., :, i] for i in range(3)]
    overlaps = []
    signed = []
    for a in axes:
        r1 = sum(
            jnp.abs(jnp.sum(a * R1[..., :, i], axis=-1)) * s1[..., i] for i in range(3)
        )
        r2 = sum(
            jnp.abs(jnp.sum(a * R2[..., :, i], axis=-1)) * s2[..., i] for i in range(3)
        )
        dist = jnp.sum(d * a, axis=-1)
        overlaps.append(r1 + r2 - jnp.abs(dist))
        signed.append(dist)
    overlaps = jnp.stack(overlaps, axis=-1)  # (..., 6)
    signed = jnp.stack(signed, axis=-1)
    sep = jnp.min(overlaps, axis=-1)  # min overlap; < 0 -> separated
    k = jnp.argmin(overlaps, axis=-1).astype(jnp.int32)  # (...,)
    axes_st = jnp.stack(axes, axis=-2)  # (..., 6, 3)
    a_min = jnp.take_along_axis(axes_st, k[..., None, None], axis=-2)[..., 0, :]
    sgn = jnp.sign(
        jnp.take_along_axis(signed, k[..., None], axis=-1)[..., 0]
    )
    sgn = jnp.where(sgn == 0.0, 1.0, sgn)
    # normal points from box1 toward box2 (push geom2 out along +n)
    n = a_min * sgn[..., None]

    separated = sep < -MARGIN
    ref_is_1 = k < 3

    def sel(a, b, cond):
        return jnp.where(cond[..., None], a, b)

    # reference box = owner of the SAT axis; incident box = the other
    p_r = sel(p1, p2, ref_is_1)
    p_i = sel(p2, p1, ref_is_1)
    s_r = sel(s1, s2, ref_is_1)
    s_i = sel(s2, s1, ref_is_1)
    R_r = jnp.where(ref_is_1[..., None, None], R1, R2)
    R_i = jnp.where(ref_is_1[..., None, None], R2, R1)
    n_ri = sel(n, -n, ref_is_1)  # points from ref box toward inc box

    # reference face frame: a = SAT axis, (u, v) = the other two box axes
    a_idx = k % 3
    oh_a = jax.nn.one_hot(a_idx, 3, dtype=p1.dtype)  # (..., 3)
    oh_u = jax.nn.one_hot((a_idx + 1) % 3, 3, dtype=p1.dtype)
    oh_v = jax.nn.one_hot((a_idx + 2) % 3, 3, dtype=p1.dtype)
    col = lambda R, oh: jnp.einsum("...ij,...j->...i", R, oh)
    u = col(R_r, oh_u)
    v = col(R_r, oh_v)
    su = jnp.sum(s_r * oh_u, axis=-1)  # (...,)
    sv = jnp.sum(s_r * oh_v, axis=-1)
    sa = jnp.sum(s_r * oh_a, axis=-1)
    c_face = p_r + n_ri * sa[..., None]  # ref face center (face toward inc)

    # incident face: inc-box axis most anti-parallel to n_ri
    dots = jnp.einsum("...ij,...i->...j", R_i, n_ri)  # (..., 3)
    j = jnp.argmax(jnp.abs(dots), axis=-1).astype(jnp.int32)
    oh_j = jax.nn.one_hot(j, 3, dtype=p1.dtype)
    oh_e1 = jax.nn.one_hot((j + 1) % 3, 3, dtype=p1.dtype)
    oh_e2 = jax.nn.one_hot((j + 2) % 3, 3, dtype=p1.dtype)
    dj = jnp.sum(dots * oh_j, axis=-1)
    f_sign = -jnp.sign(jnp.where(dj == 0.0, 1.0, dj))
    f_n = col(R_i, oh_j) * f_sign[..., None]  # inc face normal, toward ref
    e1 = col(R_i, oh_e1)
    e2 = col(R_i, oh_e2)
    sj = jnp.sum(s_i * oh_j, axis=-1)
    he1 = jnp.sum(s_i * oh_e1, axis=-1)
    he2 = jnp.sum(s_i * oh_e2, axis=-1)
    c_inc = p_i + f_n * sj[..., None]  # incident face center

    # project incident-face corners into (s, t, h): ref-face tangent coords +
    # height along n_ri (h < 0 = penetrating below the ref face)
    def proj(pt):
        rel = pt - c_face
        return (
            jnp.sum(rel * u, axis=-1),
            jnp.sum(rel * v, axis=-1),
            jnp.sum(rel * n_ri, axis=-1),
        )

    csigns = ((-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0))
    cs, ct, ch = [], [], []
    for sx, sy in csigns:
        pt = c_inc + e1 * (sx * he1)[..., None] + e2 * (sy * he2)[..., None]
        s_, t_, h_ = proj(pt)
        cs.append(s_)
        ct.append(t_)
        ch.append(h_)

    # incident plane in ref coords: h(s, t) = h0 + beta*(s-s0) + gamma*(t-t0)
    # (exact — the face is planar); solved from the two edge vectors
    As, At, Ah = cs[1] - cs[0], ct[1] - ct[0], ch[1] - ch[0]
    Bs, Bt, Bh = cs[3] - cs[0], ct[3] - ct[0], ch[3] - ch[0]
    det = As * Bt - At * Bs
    det_safe = jnp.where(jnp.abs(det) < 1e-9, 1.0, det)
    degen = jnp.abs(det) < 1e-9  # incident face edge-on to the ref face
    beta = jnp.where(degen, 0.0, (Ah * Bt - Bh * At) / det_safe)
    gamma = jnp.where(degen, 0.0, (As * Bh - Bs * Ah) / det_safe)

    def h_at(s_, t_):
        return ch[0] + beta * (s_ - cs[0]) + gamma * (t_ - ct[0])

    # inside test for the projected incident face (a parallelogram): solve
    # pt - center = alpha*(A/2) + tau*(B/2); inside iff |alpha|,|tau| <= 1
    mcs = 0.25 * sum(cs)
    mct = 0.25 * sum(ct)
    a_len = jnp.sqrt(As * As + At * At)
    b_len = jnp.sqrt(Bs * Bs + Bt * Bt)
    tol_a = 1.0 + 2.0 * MARGIN / jnp.maximum(a_len, 1e-6)
    tol_b = 1.0 + 2.0 * MARGIN / jnp.maximum(b_len, 1e-6)

    def in_inc(s_, t_):
        ds_, dt_ = s_ - mcs, t_ - mct
        alpha = 2.0 * (ds_ * Bt - dt_ * Bs) / det_safe
        tau = 2.0 * (At * ds_ - As * dt_) / det_safe
        return (~degen) & (jnp.abs(alpha) <= tol_a) & (jnp.abs(tau) <= tol_b)

    rows = []  # (s, t, h, valid)
    # rows 1-4: incident corners clamped into the reference face rect
    for i in range(4):
        s_cl = jnp.clip(cs[i], -su, su)
        t_cl = jnp.clip(ct[i], -sv, sv)
        h_cl = h_at(s_cl, t_cl)
        # a clamped point must still lie on the incident patch; an unclamped
        # corner is on it by construction
        moved = (jnp.abs(s_cl - cs[i]) > 1e-7) | (jnp.abs(t_cl - ct[i]) > 1e-7)
        ok = jnp.where(moved, in_inc(s_cl, t_cl), True)
        rows.append((s_cl, t_cl, jnp.where(moved, h_cl, ch[i]), ok))
    # rows 5-8: reference face rect corners inside the projected incident face
    for sx, sy in csigns:
        s0 = jnp.broadcast_to(sx * su, su.shape)
        t0 = jnp.broadcast_to(sy * sv, sv.shape)
        rows.append((s0, t0, h_at(s0, t0), in_inc(s0, t0)))

    # drop near-coincident rows (a clamped incident corner landing on a ref
    # rect corner would otherwise double that point's impulse — the solver
    # iterates Jacobi-style, so duplicated rows over-stiffen the manifold)
    scale = jnp.maximum(jnp.maximum(su, sv), 1e-3)
    eps2 = (1e-3 * scale) ** 2
    out = []
    for m, (s_m, t_m, h_m, ok_m) in enumerate(rows):
        dup = jnp.zeros_like(ok_m)
        for l in range(m):
            s_l, t_l, _, ok_l = rows[l]
            near = (s_m - s_l) ** 2 + (t_m - t_l) ** 2 < eps2
            dup = dup | (near & ok_l)
        depth = jnp.where(ok_m & ~dup & ~separated, -h_m, BAD_DEPTH)
        pos = (
            c_face
            + u * s_m[..., None]
            + v * t_m[..., None]
            + n_ri * jnp.minimum(h_m, 0.0)[..., None]
        )
        out.append((pos, n, depth))
    return out


def box_capsule(p1, q1, s1, p2, q2, s2) -> List[Cand]:
    """Capsule segment sampled at ends + middle, each as sphere-vs-box."""
    r, hl = s2[..., 0], s2[..., 1]
    axis = rc.quaternion_apply(q2, jnp.zeros_like(p2).at[..., 2].set(1.0))
    out = []
    for t in (-1.0, 0.0, 1.0):
        center = p2 + axis * (t * hl)[..., None]
        pos, n, depth = _sphere_vs_box(center, r, p1, q1, s1)
        # _sphere_vs_box treats the sphere as geom1; here the capsule is
        # geom2, so flip the normal back.
        out.append((pos, -n, depth))
    return out


def capsule_capsule(p1, q1, s1, p2, q2, s2) -> List[Cand]:
    r1, h1 = s1[..., 0], s1[..., 1]
    r2, h2 = s2[..., 0], s2[..., 1]
    a1 = rc.quaternion_apply(q1, jnp.zeros_like(p1).at[..., 2].set(1.0))
    a2 = rc.quaternion_apply(q2, jnp.zeros_like(p2).at[..., 2].set(1.0))
    # closest points between segments (batched, clamped coordinates)
    d = p2 - p1
    a1d = jnp.sum(a1 * d, axis=-1)
    a2d = jnp.sum(a2 * d, axis=-1)
    a12 = jnp.sum(a1 * a2, axis=-1)
    denom = 1.0 - a12 * a12
    t1 = jnp.where(denom > 1e-6, (a1d - a12 * a2d) / jnp.maximum(denom, 1e-6), 0.0)
    t1 = jnp.clip(t1, -h1, h1)
    t2 = jnp.clip(jnp.sum((p1 + a1 * t1[..., None] - p2) * a2, axis=-1), -h2, h2)
    t1 = jnp.clip(jnp.sum((p2 + a2 * t2[..., None] - p1) * a1, axis=-1), -h1, h1)
    c1 = p1 + a1 * t1[..., None]
    c2 = p2 + a2 * t2[..., None]
    delta = c2 - c1
    dist = jnp.linalg.norm(delta, axis=-1)
    n = delta / jnp.maximum(dist[..., None], 1e-9)
    depth = r1 + r2 - dist
    pos = c1 + n * (r1[..., None] - 0.5 * depth[..., None])
    return [(pos, n, depth)]


# ======================================================================
# convex hull narrowphase (geom type HULL) — support-function SAT
# ======================================================================
#
# Convex shapes are vertex clouds ("hull proxies", cooked by
# building/cooking.py, replacing the reference's coacd + PhysX convex
# cooking). Primitives entering a hull pair are converted to equivalent
# vertex clouds with a margin radius (sphere = 1 vert + r, capsule = 2 + r,
# box = 8 corners). Contact normal = the minimum-penetration axis over both
# hulls' dominant facet normals (± each) plus the center line; the manifold
# = the 4 deepest vertices of the incident hull along that axis. This is
# exact SAT minus edge-edge axes — fully batched, static shapes, and the
# support scans are MXU matmuls.

HULL_CONTACTS = 4


def _support_sat(pA, qA, vA, dA, rA, pB, qB, vB, dB, rB) -> List[Cand]:
    """Generic convex-convex narrowphase; returns HULL_CONTACTS candidates.

    pX (B,P,3), qX (B,P,4), vX local verts (B,P,V,3) or (P,V,3),
    dX local candidate normals (P,D,3) or None, rX margin radius (B,P)|(P,)|0.
    """
    B, P = pA.shape[:2]

    def wverts(p, q, v):
        v = jnp.broadcast_to(v, (B, P) + v.shape[-2:])
        return p[:, :, None] + rc.quaternion_apply(q[:, :, None], v)

    wA = wverts(pA, qA, vA)  # (B, P, VA, 3)
    wB = wverts(pB, qB, vB)
    rA = jnp.broadcast_to(jnp.asarray(rA, jnp.float32), (B, P))
    rB = jnp.broadcast_to(jnp.asarray(rB, jnp.float32), (B, P))

    def wdirs(q, d):
        # d: (P, D, 3) shared across envs, or (B, P, D, 3) heterogeneous
        if d.ndim == 3:
            d = d[None]
        d = jnp.broadcast_to(d, (B, P) + d.shape[-2:])
        return rc.quaternion_apply(q[:, :, None], d)

    cands = []
    nA = 0
    if dA is not None:
        cands.append(wdirs(qA, dA))
        nA = dA.shape[-2]
    if dB is not None:
        cands.append(wdirs(qB, dB))
    cl = pB - pA
    cl = cl / jnp.maximum(jnp.linalg.norm(cl, axis=-1, keepdims=True), 1e-9)
    cands.append(cl[:, :, None])
    dirs = jnp.concatenate(cands, axis=2)  # (B, P, D, 3)
    D = dirs.shape[2]

    dotA = jnp.einsum("bpvk,bpdk->bpdv", wA, dirs)
    dotB = jnp.einsum("bpvk,bpdk->bpdv", wB, dirs)
    maxA, minA = dotA.max(-1), dotA.min(-1)  # (B, P, D)
    maxB, minB = dotB.max(-1), dotB.min(-1)
    r2 = (rA + rB)[:, :, None]
    # penetration pushing B along +d / along -d
    penP = maxA - minB + r2
    penN = maxB - minA + r2
    pen2 = jnp.concatenate([penP, penN], axis=-1)  # (B, P, 2D)
    k = jnp.argmin(pen2, axis=-1)  # (B, P)
    pen = jnp.take_along_axis(pen2, k[..., None], axis=-1)[..., 0]
    is_neg = k >= D
    kd = jnp.where(is_neg, k - D, k)
    dstar = jnp.take_along_axis(
        dirs, kd[..., None, None].astype(jnp.int32).repeat(3, -1), axis=2
    )[:, :, 0]
    n = jnp.where(is_neg[..., None], -dstar, dstar)  # (B, P, 3) pushes B out

    # supports along the chosen axis n
    ndotA = jnp.einsum("bpvk,bpk->bpv", wA, n)
    ndotB = jnp.einsum("bpvk,bpk->bpv", wB, n)
    supA = ndotA.max(-1)  # (B, P)
    infB = ndotB.min(-1)
    # per-vertex penetration depths
    depthB_v = supA[..., None] + r2 - ndotB  # B verts into A (B, P, VB)
    depthA_v = ndotA + r2 - infB[..., None]  # A verts into B (B, P, VA)

    # incident hull: the one NOT owning the winning face axis (centerline or
    # B-owned axis -> take B verts; A-owned... axis from A's normals means
    # A's face is the reference -> B is incident).
    fromA = kd < nA  # (B, P)
    VA, VB = wA.shape[2], wB.shape[2]
    V = max(VA, VB)

    def padv(x, V):
        if x.shape[2] == V:
            return x
        reps = [x[:, :, :1]] * (V - x.shape[2])
        return jnp.concatenate([x] + reps, axis=2)

    depth_v = jnp.where(
        fromA[..., None], padv(depthB_v[..., None], V)[..., 0],
        padv(depthA_v[..., None], V)[..., 0],
    )
    verts_v = jnp.where(
        fromA[..., None, None], padv(wB, V), padv(wA, V)
    )
    kk = min(HULL_CONTACTS, V)
    top_d, top_i = jax.lax.top_k(depth_v, kk)  # (B, P, kk)
    top_v = jnp.take_along_axis(
        verts_v, top_i[..., None].astype(jnp.int32).repeat(3, -1), axis=2
    )
    separated = pen < -MARGIN
    out = []
    for i in range(kk):
        d_i = jnp.where(separated, BAD_DEPTH, top_d[..., i])
        out.append((top_v[:, :, i], n, d_i))  # anchored at the deep vertex
    while len(out) < HULL_CONTACTS:
        out.append((top_v[:, :, 0], n, jnp.full(pen.shape, BAD_DEPTH)))
    return out


_BOX_CORNERS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    np.float32,
)  # (8, 3)
_EYE3 = np.eye(3, dtype=np.float32)


def _as_hull_operand(model: Model, ttype: int, gidx: np.ndarray, gquat, size):
    """(verts, dirs, margin) for one side of a hull pair."""
    if ttype == HULL:
        gh = np.asarray(model.geom_hull)[gidx]
        hv = model.hull_verts
        if hv.ndim == 4:  # heterogeneous (B, NH, MAXV, 3)
            verts = hv[:, gh]
        else:
            verts = hv[gh]  # (P, MAXV, 3)
        hd = model.hull_dirs
        if hd.ndim == 4:  # heterogeneous (B, NH, D, 3)
            dirs = hd[:, gh]
        else:
            dirs = hd[gh]  # (P, D, 3)
        return verts, dirs, 0.0
    if ttype == BOX:
        verts = _BOX_CORNERS[None] * size[..., None, :]  # (..., P, 8, 3)
        return verts, jnp.asarray(_EYE3[None].repeat(len(gidx), 0)), 0.0
    if ttype == SPHERE:
        verts = jnp.zeros(size.shape[:-1] + (1, 3), jnp.float32)
        return verts, None, size[..., 0]
    if ttype == CAPSULE:
        z = jnp.asarray([[0.0, 0, -1], [0.0, 0, 1]], jnp.float32)
        verts = z[None] * size[..., 1:2, None]  # (..., P, 2, 3) +- hl z
        return verts, jnp.asarray(np.array([[[0.0, 0, 1]]], np.float32).repeat(len(gidx), 0)), size[..., 0]
    if ttype == CYLINDER:
        # 8 rim points per cap; size = (radius, half_len)
        ang = np.pi / 4 * np.arange(8)
        rim = np.stack([np.cos(ang), np.sin(ang), np.zeros(8)], -1).astype(np.float32)
        local = np.concatenate(
            [rim + [0, 0, 1.0], rim + [0, 0, -1.0]], 0
        )  # (16, 3) unit
        scale = jnp.stack(
            [size[..., 0], size[..., 0], size[..., 1]], axis=-1
        )  # (..., P, 3)
        verts = local[None] * scale[..., None, :]
        dirs = np.concatenate([rim[:4], [[0, 0, 1.0]]], 0).astype(np.float32)
        return verts, jnp.asarray(dirs[None].repeat(len(gidx), 0)), 0.0
    raise ValueError(f"geom type {ttype} cannot enter a hull pair")


def plane_hull(model: Model, i2: np.ndarray, p1, q1, s1, p2, q2, s2) -> List[Cand]:
    """Plane vs convex hull: the 4 deepest proxy vertices below the plane."""
    n = _plane_normal(q1)
    verts, _, margin = _as_hull_operand(model, HULL, i2, q2, s2)
    B, P = p2.shape[:2]
    verts = jnp.broadcast_to(verts, (B, P) + verts.shape[-2:])
    w = p2[:, :, None] + rc.quaternion_apply(q2[:, :, None], verts)  # (B,P,V,3)
    h = jnp.sum((w - p1[:, :, None]) * n[:, :, None], axis=-1)  # (B, P, V)
    depth = -h
    top_d, top_i = jax.lax.top_k(depth, 4)
    top_w = jnp.take_along_axis(
        w, top_i[..., None].astype(jnp.int32).repeat(3, -1), axis=2
    )
    return [(top_w[:, :, i], n, top_d[..., i]) for i in range(4)]


_DISPATCH = {
    (PLANE, SPHERE): plane_sphere,
    (PLANE, BOX): plane_box,
    (PLANE, CAPSULE): plane_capsule,
    (PLANE, CYLINDER): plane_cylinder,
    (SPHERE, SPHERE): sphere_sphere,
    (SPHERE, BOX): sphere_box,
    (SPHERE, CAPSULE): sphere_capsule,
    (BOX, BOX): box_box,
    (BOX, CAPSULE): box_capsule,
    (CAPSULE, CAPSULE): capsule_capsule,
    # cylinders only collide with planes for now (used for drive wheels etc.)
}


def contacts_per_pair(t1: int, t2: int) -> int:
    fn_points = {
        (PLANE, SPHERE): 1,
        (PLANE, BOX): 4,
        (PLANE, CAPSULE): 2,
        (PLANE, CYLINDER): 8,
        (SPHERE, SPHERE): 1,
        (SPHERE, BOX): 1,
        (SPHERE, CAPSULE): 1,
        (BOX, BOX): 8,
        (BOX, CAPSULE): 3,
        (CAPSULE, CAPSULE): 1,
        # convex hull proxies (support-function SAT narrowphase)
        (PLANE, HULL): 4,
        (SPHERE, HULL): HULL_CONTACTS,
        (BOX, HULL): HULL_CONTACTS,
        (CAPSULE, HULL): HULL_CONTACTS,
        (CYLINDER, HULL): HULL_CONTACTS,
        (HULL, HULL): HULL_CONTACTS,
    }
    return fn_points.get((t1, t2), 0)


@f32_matmuls
def collide(model: Model, data: Data, kin=None) -> Contact:
    """Run narrowphase for all candidate pairs -> static-shape Contact set.

    Pairs are grouped by (type1, type2) and each group is evaluated in ONE
    vectorized call over a gathered (B, P, ...) pair axis — compile-time and
    runtime scale with the number of type combos, not the number of pairs.

    ``kin`` is the component-form kinematics tuple (see cf.py); when given,
    geom poses derive from it instead of from (possibly stale) data.xpos.
    """
    B = data.batch_size
    if kin is not None:
        from . import cf
        from .kinematics import geom_poses_cf

        gp_c, gq_c = geom_poses_cf(model, kin[0], kin[1])
        gpos, gquat = cf.fb(gp_c), cf.fb(gq_c)
    else:
        gpos, gquat = geom_poses(model, data)
    size = model.geom_size
    if size.ndim == 2:
        size = jnp.broadcast_to(size, (B,) + size.shape)
    fric = model.geom_friction
    if fric.ndim == 1:
        fric = jnp.broadcast_to(fric, (B,) + fric.shape)
    rest = model.geom_restitution
    if rest is None:
        rest = jnp.zeros((B, model.ngeom), jnp.float32)
    elif rest.ndim == 1:
        rest = jnp.broadcast_to(rest, (B,) + rest.shape)

    # group candidate pairs by type combo (static)
    groups = {}
    for g1, g2 in zip(model.pair_geom1, model.pair_geom2):
        g1, g2 = int(g1), int(g2)
        key = (int(model.geom_type[g1]), int(model.geom_type[g2]))
        groups.setdefault(key, []).append((g1, g2))

    pos_l, n_l, d_l, f_l, e_l, g1_l, g2_l = [], [], [], [], [], [], []
    for (t1, t2), pairs in sorted(groups.items()):
        i1 = np.array([p[0] for p in pairs], np.int32)
        i2 = np.array([p[1] for p in pairs], np.int32)
        P = len(pairs)
        if t2 == HULL and t1 == PLANE:
            cands = plane_hull(
                model, i2,
                gpos[:, i1], gquat[:, i1], size[:, i1],
                gpos[:, i2], gquat[:, i2], size[:, i2],
            )
        elif t2 == HULL:
            vA, dA, rA = _as_hull_operand(model, t1, i1, gquat[:, i1], size[:, i1])
            vB, dB, rB = _as_hull_operand(model, t2, i2, gquat[:, i2], size[:, i2])
            cands = _support_sat(
                gpos[:, i1], gquat[:, i1], vA, dA, rA,
                gpos[:, i2], gquat[:, i2], vB, dB, rB,
            )
        else:
            fn = _DISPATCH.get((t1, t2))
            if fn is None:
                continue
            cands = fn(
                gpos[:, i1], gquat[:, i1], size[:, i1],
                gpos[:, i2], gquat[:, i2], size[:, i2],
            )
        mu = 0.5 * (fric[:, i1] + fric[:, i2])  # (B, P)
        en = 0.5 * (rest[:, i1] + rest[:, i2])  # (B, P) PhysX average combine
        for (cp, cn, cd) in cands:
            pos_l.append(cp)  # (B, P, 3)
            n_l.append(cn)
            d_l.append(cd)  # (B, P)
            f_l.append(mu)
            e_l.append(en)
            g1_l.append(i1)
            g2_l.append(i2)

    if not pos_l:
        return Contact(
            geom1=HArray(np.zeros(0, np.int32)),
            geom2=HArray(np.zeros(0, np.int32)),
            pos=jnp.zeros((B, 0, 3), jnp.float32),
            normal=jnp.zeros((B, 0, 3), jnp.float32),
            depth=jnp.zeros((B, 0), jnp.float32),
            friction=jnp.zeros((B, 0), jnp.float32),
            restitution=jnp.zeros((B, 0), jnp.float32),
            impulse=jnp.zeros((B, 0, 3), jnp.float32),
            overflow=jnp.zeros((B,), jnp.int32),
        )

    geom1 = np.concatenate(g1_l)
    return Contact(
        geom1=HArray(geom1),
        geom2=HArray(np.concatenate(g2_l)),
        pos=jnp.concatenate(pos_l, axis=1),
        normal=jnp.concatenate(n_l, axis=1),
        depth=jnp.concatenate(d_l, axis=1),
        friction=jnp.concatenate(f_l, axis=1),
        restitution=jnp.concatenate(e_l, axis=1),
        impulse=jnp.zeros((B, len(geom1), 3), jnp.float32),
        overflow=jnp.zeros((B,), jnp.int32),
    )

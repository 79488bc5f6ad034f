"""Micro-profile the contact solver stages on a contact-rich benchmark env.

Times each internal stage of physics.solver.solve separately so regressions
in jacobian assembly vs. iteration matvecs vs. power iteration are visible.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make
from maniskill_tpu.physics.collision import collide
from maniskill_tpu.physics.dynamics import smooth_dynamics
from maniskill_tpu.physics.kinematics import forward_kinematics_cf
from maniskill_tpu.physics import solver as S

N = int(os.environ.get("N", "4096"))
ENV_ID = os.environ.get("ENV_ID", "FrankaPickCubeBenchmark-v1")
env = make(ENV_ID, num_envs=N, obs_mode="state", control_mode="pd_joint_delta_pos")
base = env.unwrapped
env.reset(seed=0)
model = base.scene.model
data = base.scene.data

kin = jax.jit(lambda d: forward_kinematics_cf(model, d.qpos, d.qvel))(data)
Minv, qvel_pred, _ = jax.jit(lambda d, k: smooth_dynamics(model, d, k))(data, kin)
contact = jax.jit(lambda d, k: collide(model, d, k))(data, kin)
jax.block_until_ready((Minv, contact))

B = N
nv = model.nv
h = model.timestep
C_full = contact.pos.shape[1]
K = model.max_active_contacts
print("nv", nv, "C_full", C_full, "K", K, "iters", model.solver_iterations)


def timeit(name, fn, *args, reps=50):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:30s} {dt*1e3:8.3f} ms")
    return out


# --- stage 1: compaction + jacobian assembly + W/diag ----------------------
def assemble(data, contact, Minv):
    dyn = (model.body_type == 0).astype(np.float32)
    b1 = model.geom_body[contact.geom1]
    b2 = model.geom_body[contact.geom2]
    w_full = jnp.asarray(
        (model.ancestor_mask[b2] * dyn[b2][:, None])
        - (model.ancestor_mask[b1] * dyn[b1][:, None]),
        jnp.float32,
    )
    cdepth, idx = jax.lax.top_k(contact.depth, K)
    g3 = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1)
    cpos = g3(contact.pos)
    cnormal = g3(contact.normal)
    cmu = jnp.take_along_axis(contact.friction, idx, axis=1)
    w = jnp.take(w_full, idx, axis=0)
    C = K

    sl_sign, limit_depth, lim_dofs = S.limit_rows(model, data)
    L = len(lim_dofs)

    t1, t2 = S._tangent_basis(cnormal)
    rows3 = lambda v: jnp.swapaxes(v, 1, 2)
    U = jnp.stack([rows3(cnormal), rows3(t1), rows3(t2)], axis=-1).reshape(B, 3, C * 3)
    P = jnp.broadcast_to(rows3(cpos)[..., None], (B, 3, C, 3)).reshape(B, 3, C * 3)
    Mx = jnp.cross(P, U, axis=1)
    from maniskill_tpu.physics import cf
    from maniskill_tpu.physics.kinematics import dof_frames_cf

    ax_c, an_c = dof_frames_cf(model, kin[0], kin[1])
    dof_axis, dof_anchor = cf.fb(ax_c), cf.fb(an_c)
    hvec = jnp.cross(dof_axis, dof_anchor)
    ir = jnp.asarray(model.dof_is_rot, jnp.float32)[None, :, None]
    Lf = jnp.concatenate([dof_axis * ir, dof_axis * (1.0 - ir) - hvec * ir], axis=-1)
    Rf = jnp.concatenate([Mx, U], axis=1)
    Jc = jnp.einsum("bvk,bkr->bvr", Lf, Rf)
    w_t = jnp.repeat(jnp.swapaxes(jnp.broadcast_to(w, (B, C, nv)), 1, 2), 3, axis=2)
    Jc = Jc * w_t
    Jl_t = jnp.zeros((B, nv, L), jnp.float32).at[:, lim_dofs, jnp.arange(L)].set(sl_sign)
    Jt = jnp.concatenate([Jc, Jl_t], axis=2)
    active_c = cdepth > -model.contact_margin
    arow = jnp.concatenate([jnp.repeat(active_c, 3, axis=1), limit_depth > -0.01], axis=1)
    Jt = Jt * arow[:, None, :]
    W = jnp.einsum("bij,bjr->bir", Minv, Jt)
    diag_A = jnp.einsum("bvr,bvr->br", Jt, W)
    return Jt, W, diag_A, arow, cdepth, cmu, limit_depth


Jt, W, diag_A, arow, cdepth, cmu, limit_depth = timeit(
    "assemble J/W/diag", assemble, data, contact, Minv
)
R = Jt.shape[2]
C = K
L = R - 3 * C
print("R", R)
inv_diag = jnp.where(diag_A > 1e-9, 1.0 / jnp.maximum(diag_A, 1e-9), 0.0)


def power_iter(Jt, W, inv_diag, arow):
    W16 = W.astype(jnp.bfloat16)
    Jt16 = Jt.astype(jnp.bfloat16)

    def matvec(x):
        dv = jnp.einsum("bvr,br->bv", W16, x.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return jnp.einsum("bvr,bv->br", Jt16, dv.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def pw_body(i, x):
        y = inv_diag * matvec(x)
        norm = jnp.linalg.norm(y, axis=-1, keepdims=True)
        return y / jnp.maximum(norm, 1e-12)

    x0 = arow.astype(jnp.float32)
    x0 = x0 / jnp.maximum(jnp.linalg.norm(x0, axis=-1, keepdims=True), 1e-12)
    x = jax.lax.fori_loop(0, 8, pw_body, x0)
    y = inv_diag * matvec(x)
    rho = jnp.sum(x * y, axis=-1, keepdims=True)
    return 0.9 / jnp.maximum(rho, 1.0)


omega = timeit("power iteration (8)", power_iter, Jt, W, inv_diag, arow)


def main_loop(Jt, W, inv_diag, arow, omega):
    W16 = W.astype(jnp.bfloat16)
    Jt16 = Jt.astype(jnp.bfloat16)
    v0 = jnp.zeros((B, R), jnp.float32)
    target = jnp.zeros((B, R), jnp.float32)
    mu = cmu

    def matvec(x):
        dv = jnp.einsum("bvr,br->bv", W16, x.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return jnp.einsum("bvr,bv->br", Jt16, dv.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def project(lam):
        cap_hi = model.max_impulse
        lc = lam[:, : C * 3].reshape(B, C, 3)
        ln = jnp.clip(lc[..., 0], 0.0, cap_hi)
        cap = mu * ln
        lt1 = jnp.clip(lc[..., 1], -cap, cap)
        lt2 = jnp.clip(lc[..., 2], -cap, cap)
        lc = jnp.stack([ln, lt1, lt2], axis=-1).reshape(B, C * 3)
        ll = jnp.clip(lam[:, C * 3:], 0.0, cap_hi)
        return jnp.concatenate([lc, ll], axis=1)

    def body(i, lam):
        r = matvec(lam) + v0 - target
        lam = lam - omega * inv_diag * r
        return project(lam)

    return jax.lax.fori_loop(0, model.solver_iterations, body, jnp.zeros((B, R), jnp.float32))


timeit(f"main loop ({model.solver_iterations})", main_loop, Jt, W, inv_diag, arow, omega)


def matvec_once(Jt, W, x):
    W16 = W.astype(jnp.bfloat16)
    Jt16 = Jt.astype(jnp.bfloat16)
    dv = jnp.einsum("bvr,br->bv", W16, x.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
    return jnp.einsum("bvr,bv->br", Jt16, dv.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


x = arow.astype(jnp.float32)
timeit("single matvec pair", matvec_once, Jt, W, x)

full = timeit("solve (full)", lambda d, mi, qp, c: S.solve(model, d, mi, qp, c, kin)[0],
              data, Minv, qvel_pred, contact)


# --- assembly substages -----------------------------------------------------
def stage_topk(contact):
    return jax.lax.top_k(contact.depth, K)


cdepth2, idx = timeit("  top_k", stage_topk, contact)


def stage_gathers(contact, idx):
    dyn = (model.body_type == 0).astype(np.float32)
    b1 = model.geom_body[contact.geom1]
    b2 = model.geom_body[contact.geom2]
    w_full = jnp.asarray(
        (model.ancestor_mask[b2] * dyn[b2][:, None])
        - (model.ancestor_mask[b1] * dyn[b1][:, None]),
        jnp.float32,
    )
    g3 = lambda a: jnp.take_along_axis(a, idx[..., None], axis=1)
    return (g3(contact.pos), g3(contact.normal),
            jnp.take_along_axis(contact.friction, idx, axis=1),
            jnp.take(w_full, idx, axis=0))


cpos, cnormal, cmu2, w = timeit("  gathers", stage_gathers, contact, idx)


def stage_jac(cpos, cnormal, w):
    C = K
    t1, t2 = S._tangent_basis(cnormal)
    rows3 = lambda v: jnp.swapaxes(v, 1, 2)
    U = jnp.stack([rows3(cnormal), rows3(t1), rows3(t2)], axis=-1).reshape(B, 3, C * 3)
    P = jnp.broadcast_to(rows3(cpos)[..., None], (B, 3, C, 3)).reshape(B, 3, C * 3)
    Mx = jnp.cross(P, U, axis=1)
    from maniskill_tpu.physics import cf
    from maniskill_tpu.physics.kinematics import dof_frames_cf

    ax_c, an_c = dof_frames_cf(model, kin[0], kin[1])
    dof_axis, dof_anchor = cf.fb(ax_c), cf.fb(an_c)
    hvec = jnp.cross(dof_axis, dof_anchor)
    ir = jnp.asarray(model.dof_is_rot, jnp.float32)[None, :, None]
    Lf = jnp.concatenate([dof_axis * ir, dof_axis * (1.0 - ir) - hvec * ir], axis=-1)
    Rf = jnp.concatenate([Mx, U], axis=1)
    Jc = jnp.einsum("bvk,bkr->bvr", Lf, Rf)
    w_t = jnp.repeat(jnp.swapaxes(jnp.broadcast_to(w, (B, C, nv)), 1, 2), 3, axis=2)
    return Jc * w_t


Jc2 = timeit("  jacobian einsum", stage_jac, cpos, cnormal, w)


def stage_W(Jt, Minv):
    W = jnp.einsum("bij,bjr->bir", Minv, Jt)
    diag_A = jnp.einsum("bvr,bvr->br", Jt, W)
    return W, diag_A


timeit("  W = Minv@Jt + diag", stage_W, Jt, Minv)


def stage_limits(data):
    return S.limit_rows(model, data)


timeit("  limit_rows", stage_limits, data)

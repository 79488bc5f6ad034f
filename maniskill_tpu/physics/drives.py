"""Body-body 6-dof drives (counterpart of the reference's
sapien PhysxDriveComponent / mani_skill/utils/structs/drive.py:6).

A drive is a spring-damper wrench pulling a frame on body2 toward a frame
on body1 composed with a per-env target relative pose — the mechanism the
reference teleop uses to drag objects. Wrenches are computed per substep
from the component-form kinematics and added to ``xfrc_applied``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.geometry import rotation_conversions as rc
from .types import Data, Model


def drive_wrenches(model: Model, data: Data, kin) -> jax.Array:
    """Returns (B, nbody, 6) [force(3) applied at body origin? -> we return
    [force, torque] about each body's frame origin] to add to xfrc_applied."""
    xpos_c, xquat_c, v_c, w_c = kin  # (3, nb, B), (4, nb, B), ...
    B = data.batch_size
    nb = model.nbody
    b1 = model.drive6_body1
    b2 = model.drive6_body2
    ND = len(b1)

    # body poses/velocities at the drive bodies, batch-first (B, ND, ...)
    def bf(x, idx):
        return jnp.moveaxis(x[:, idx], -1, 0).swapaxes(1, 2)  # (B, ND, k)

    p1b, q1b = bf(xpos_c, b1), bf(xquat_c, b1)
    p2b, q2b = bf(xpos_c, b2), bf(xquat_c, b2)
    v1b, w1b = bf(v_c, b1), bf(w_c, b1)
    v2b, w2b = bf(v_c, b2), bf(w_c, b2)

    # world drive frames
    l1p, l1q = model.drive6_pose1[:, :3], model.drive6_pose1[:, 3:]
    l2p, l2q = model.drive6_pose2[:, :3], model.drive6_pose2[:, 3:]
    tp, tq = data.drive6_target[..., :3], data.drive6_target[..., 3:]
    f1p = p1b + rc.quaternion_apply(q1b, l1p[None])
    f1q = rc.quaternion_multiply(q1b, l1q[None])
    # compose the target offset in frame1
    f1p = f1p + rc.quaternion_apply(f1q, tp)
    f1q = rc.quaternion_multiply(f1q, tq)
    f2p = p2b + rc.quaternion_apply(q2b, l2p[None])
    f2q = rc.quaternion_multiply(q2b, l2q[None])

    # frame point velocities
    v1 = v1b + jnp.cross(w1b, f1p - p1b)
    v2 = v2b + jnp.cross(w2b, f2p - p2b)

    # explicit integration stability: clamp gains per drive to the lightest
    # participating dynamic body (k <= a*m/h^2, c <= b*m/h), the analog of
    # PhysX's internal drive stabilization. Angular gains clamp against the
    # smallest principal inertia.
    h = model.timestep
    mass = jnp.asarray(model.body_mass)
    if mass.ndim == 2:  # heterogeneous (B, nb)
        mass = mass[0]
    inert = jnp.min(jnp.asarray(model.body_inertia), axis=-1)
    if inert.ndim == 2:
        inert = inert[0]
    dyn = jnp.asarray(model.body_type == 0, jnp.float32)
    big = 1e9

    def _m_eff(tab):
        m1 = jnp.where(dyn[b1] > 0, tab[b1], big)
        m2 = jnp.where(dyn[b2] > 0, tab[b2], big)
        return jnp.minimum(m1, m2)  # (ND,)

    m_eff = _m_eff(mass)
    i_eff = _m_eff(inert)
    ks = model.drive6_stiffness  # (ND, 2)
    kd = model.drive6_damping
    ks = jnp.stack(
        [
            jnp.minimum(ks[:, 0], 0.25 * m_eff / h**2),
            jnp.minimum(ks[:, 1], 0.25 * i_eff / h**2),
        ],
        axis=-1,
    )
    kd = jnp.stack(
        [
            jnp.minimum(kd[:, 0], 0.5 * m_eff / h),
            jnp.minimum(kd[:, 1], 0.5 * i_eff / h),
        ],
        axis=-1,
    )
    lim = model.drive6_force_limit

    force = ks[None, :, 0:1] * (f1p - f2p) + kd[None, :, 0:1] * (v1 - v2)
    fmag = jnp.linalg.norm(force, axis=-1, keepdims=True)
    force = force * jnp.minimum(1.0, lim[None, :, 0:1] / jnp.maximum(fmag, 1e-9))

    # orientation error as axis-angle of q_err = f1q * f2q^-1
    q_err = rc.quaternion_multiply(f1q, rc.quaternion_invert(f2q))
    aa = rc.quaternion_to_axis_angle(q_err)
    torque = ks[None, :, 1:2] * aa + kd[None, :, 1:2] * (w1b - w2b)
    tmag = jnp.linalg.norm(torque, axis=-1, keepdims=True)
    torque = torque * jnp.minimum(1.0, lim[None, :, 1:2] / jnp.maximum(tmag, 1e-9))

    # scatter into per-body wrenches: +F on body2 at f2, -F on body1 at f1.
    # xfrc convention: force acts at the body's COM, torque is a pure couple
    # (dynamics.py:213-218), so arms are measured from the COMs.
    com1 = p1b + rc.quaternion_apply(q1b, jnp.asarray(model.body_ipos)[b1][None])
    com2 = p2b + rc.quaternion_apply(q2b, jnp.asarray(model.body_ipos)[b2][None])
    out = jnp.zeros((B, nb, 6), jnp.float32)
    t2 = torque + jnp.cross(f2p - com2, force)
    t1 = -torque + jnp.cross(f1p - com1, -force)
    out = out.at[:, b2, 0:3].add(force)
    out = out.at[:, b2, 3:6].add(t2)
    out = out.at[:, b1, 0:3].add(-force)
    out = out.at[:, b1, 3:6].add(t1)
    return out

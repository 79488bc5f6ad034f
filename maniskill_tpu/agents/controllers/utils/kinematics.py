"""Batched FK/Jacobian/IK for end-effector controllers.

Counterpart of mani_skill/agents/controllers/utils/kinematics.py (:34-275),
which uses pytorch_kinematics (GPU) or Pinocchio (CPU). Here IK is native:
full-tree batched FK (reusing the physics kinematics) + analytic point
Jacobians + damped-least-squares iterations, all inside jit.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ....physics import forward_kinematics
from ....physics.types import HINGE, SLIDE
from ....utils.geometry import rotation_conversions as rc


class Kinematics:
    def __init__(self, scene, articulation, end_link_name: str, joint_names):
        self.scene = scene
        self.articulation = articulation
        self.end_link = articulation.links_map[end_link_name.split(":")[-1]] if end_link_name not in articulation.links_map else articulation.links_map[end_link_name]
        joints = [
            articulation.joints_map[n]
            if n in articulation.joints_map
            else next(j for j in articulation.joints if j.name.endswith(n))
            for n in joint_names
        ]
        self.q_adrs = np.array([j.q_adr for j in joints], np.int32)
        self.dof_adrs = np.array([j.dof_adr for j in joints], np.int32)
        self.joint_bodies = np.array([j.body_id for j in joints], np.int32)

    def ee_pose(self, data):
        b = self.end_link.body_id
        return jnp.concatenate([data.xpos[:, b], data.xquat[:, b]], axis=-1)

    def _fk(self, q_arm):
        """FK with arm joints replaced by q_arm; returns data with fresh poses."""
        model = self.scene.model
        data = self.scene.data
        qpos = data.qpos.at[:, self.q_adrs].set(q_arm)
        return forward_kinematics(model, data.replace(qpos=qpos))

    def _jacobian(self, data_fk):
        """EE point Jacobian (B, 6, n): rows [lin(3), rot(3)]."""
        model = self.scene.model
        B = data_fk.qpos.shape[0]
        eb = self.end_link.body_id
        p_ee = data_fk.xpos[:, eb]
        cols_lin, cols_rot = [], []
        for body, dof in zip(self.joint_bodies, self.dof_adrs):
            body = int(body)
            jt = int(model.body_jnt_type[body])
            axis_l = jnp.broadcast_to(
                model.jnt_axis[..., body, :]
                if model.jnt_axis.ndim == 2
                else model.jnt_axis[:, body],
                (B, 3),
            )
            axis_w = rc.quaternion_apply(data_fk.xquat[:, body], axis_l)
            anchor = data_fk.xpos[:, body]
            # zero column if this joint is not an ancestor of the EE body
            on_chain = float(model.ancestor_mask[eb, int(dof)])
            if jt == HINGE:
                cols_lin.append(jnp.cross(axis_w, p_ee - anchor) * on_chain)
                cols_rot.append(axis_w * on_chain)
            else:  # SLIDE
                cols_lin.append(axis_w * on_chain)
                cols_rot.append(jnp.zeros_like(axis_w))
        jlin = jnp.stack(cols_lin, axis=-1)  # (B, 3, n)
        jrot = jnp.stack(cols_rot, axis=-1)
        return jnp.concatenate([jlin, jrot], axis=1)  # (B, 6, n)

    def compute_ik(
        self,
        target_pose: jax.Array,  # (B, 7)
        q0: jax.Array,  # (B, n) initial arm joints
        pos_only: bool = False,
        iterations: int = 8,
        damping: float = 0.05,
    ) -> jax.Array:
        """Damped-least-squares IK (kinematics.py:185-259 LM-solve parity).

        Joint-limit aware: each iterate is clamped to ``model.dof_limit`` and
        a nullspace bias pulls redundant dofs toward mid-range — without
        this, large reorientations (e.g. a 90-degree wrist pivot) converge to
        out-of-limit solutions that the position controller then clamps into
        a completely different pose."""
        tp = target_pose[:, :3]
        tq = target_pose[:, 3:]
        lim = self.scene.model.dof_limit[..., self.dof_adrs, :]
        lo, hi = lim[..., 0], lim[..., 1]
        mid = 0.5 * (lo + hi)
        has_mid = jnp.isfinite(mid)

        def body(i, q):
            data_fk = self._fk(q)
            eb = self.end_link.body_id
            p = data_fk.xpos[:, eb]
            quat = data_fk.xquat[:, eb]
            e_pos = tp - p
            if pos_only:
                err = e_pos
            else:
                e_rot = rc.quaternion_to_axis_angle(
                    rc.quaternion_multiply(tq, rc.quaternion_conjugate(quat))
                )
                err = jnp.concatenate([e_pos, e_rot], axis=-1)
            J = self._jacobian(data_fk)
            if pos_only:
                J = J[:, :3]
            k = J.shape[1]
            JJt = jnp.einsum("bik,bjk->bij", J, J) + (damping**2) * jnp.eye(
                k, dtype=J.dtype
            )
            y = jnp.linalg.solve(JJt, err[..., None])[..., 0]
            dq = jnp.einsum("bik,bi->bk", J, y)
            # nullspace: project the mid-range pull through I - J^+ J
            bias = jnp.where(has_mid, mid - q, 0.0) * 0.2
            Jb = jnp.einsum("bik,bk->bi", J, bias)
            yb = jnp.linalg.solve(JJt, Jb[..., None])[..., 0]
            bias_null = bias - jnp.einsum("bik,bi->bk", J, yb)
            return jnp.clip(q + dq + bias_null, lo, hi)

        return jax.lax.fori_loop(0, iterations, body, q0)

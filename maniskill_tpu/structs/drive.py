"""Drive struct (counterpart of mani_skill/utils/structs/drive.py:6-187).

A batched view over one body-body 6-dof drive: set the target relative pose
(per env, reset-masked) and tune stiffness/damping. Used by teleoperation to
drag objects with a spring-damper instead of teleports.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .pose import Pose


class Drive:
    def __init__(self, scene, drive_id: int, body1: int, body2: int):
        self.scene = scene
        self.drive_id = drive_id
        self.body1 = body1
        self.body2 = body2

    def set_drive_target(self, pose):
        """Target relative pose of frame2 in frame1 (per env, masked)."""
        raw = Pose.create(pose).raw_pose
        raw = jnp.broadcast_to(raw, (self.scene.num_envs, 7)).astype(jnp.float32)
        d = self.scene.data
        cur = d.drive6_target[:, self.drive_id]
        self.scene.data = d.replace(
            drive6_target=d.drive6_target.at[:, self.drive_id].set(
                self.scene.masked(raw, cur)
            )
        )

    @property
    def drive_target(self) -> Pose:
        return Pose(self.scene.data.drive6_target[:, self.drive_id])

    def set_drive_property(self, stiffness=None, damping=None, force_limit=None,
                           angular_stiffness=None, angular_damping=None):
        """Update gains (shared across envs; model-level)."""
        m = self.scene.model
        i = self.drive_id
        ks = m.drive6_stiffness
        kd = m.drive6_damping
        lim = m.drive6_force_limit
        if stiffness is not None:
            ks = ks.at[i, 0].set(float(stiffness))
        if angular_stiffness is not None:
            ks = ks.at[i, 1].set(float(angular_stiffness))
        if damping is not None:
            kd = kd.at[i, 0].set(float(damping))
        if angular_damping is not None:
            kd = kd.at[i, 1].set(float(angular_damping))
        if force_limit is not None:
            fl = np.asarray(force_limit, np.float32).reshape(-1)
            lim = lim.at[i, 0].set(float(fl[0]))
            lim = lim.at[i, 1].set(float(fl[-1]))
        self.scene.model = m.replace(
            drive6_stiffness=ks, drive6_damping=kd, drive6_force_limit=lim
        )

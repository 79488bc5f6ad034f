"""ArticulationBuilder: declarative articulation spec -> forest subtree.

Counterpart of mani_skill/utils/building/articulation_builder.py (:23-213).
Links are declared with URDF-style joint origins (joint frame in parent link
coords; child link frame == joint frame), which is exactly the physics
builder's body_pos/body_quat convention.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..physics.types import BOX, CAPSULE, CYLINDER, DYNAMIC, FIXED, FREE, HINGE, HULL, SLIDE, SPHERE
from ..structs.articulation import Articulation, ArticulationJoint
from ..structs.link import Link
from .inertia import combine_shapes, diagonalize_inertia


@dataclasses.dataclass
class ShapeSpec:
    type: int
    size: Sequence[float]
    pos: Sequence[float] = (0.0, 0.0, 0.0)
    quat: Sequence[float] = (1.0, 0.0, 0.0, 0.0)
    friction: float = 1.0
    density: float = 1000.0
    color: Tuple[float, float, float, float] = (0.6, 0.6, 0.6, 1.0)
    mesh: Optional[tuple] = None  # (verts, faces) for MESH visuals
    hull: Optional[np.ndarray] = None  # (HULL_MAX_VERTS, 3) for HULL colliders
    hull_dirs: Optional[np.ndarray] = None  # (HULL_MAX_DIRS, 3)


@dataclasses.dataclass
class LinkSpec:
    name: str
    parent: Optional[str]  # None = root
    joint_type: int = FIXED
    joint_name: Optional[str] = None
    origin_pos: Sequence[float] = (0.0, 0.0, 0.0)
    origin_quat: Sequence[float] = (1.0, 0.0, 0.0, 0.0)
    axis: Sequence[float] = (0.0, 0.0, 1.0)
    limit: Tuple[float, float] = (-np.inf, np.inf)
    damping: float = 0.0
    stiffness: float = 0.0
    springref: float = 0.0
    armature: float = 0.0
    frictionloss: float = 0.0
    mass: Optional[float] = None  # None -> from collision shapes
    com: Sequence[float] = (0.0, 0.0, 0.0)
    inertia: Optional[np.ndarray] = None  # (3,) principal or (3,3) full
    iquat: Sequence[float] = (1.0, 0.0, 0.0, 0.0)
    collisions: List[ShapeSpec] = dataclasses.field(default_factory=list)
    visuals: List[ShapeSpec] = dataclasses.field(default_factory=list)


class ArticulationBuilder:
    def __init__(self, scene):
        self.scene = scene
        self.links: List[LinkSpec] = []
        self.initial_pose = np.array([0, 0, 0, 1, 0, 0, 0], np.float64)
        self.fix_root_link = True
        self.disable_self_collisions = False
        # extra body-name pairs whose collisions are filtered
        self.collision_exclude_pairs: List[Tuple[str, str]] = []
        self.collision_groups: Tuple[int, int] = (1, 1)

    def add_link(self, spec: LinkSpec):
        self.links.append(spec)
        return self

    def set_initial_pose(self, pose7):
        self.initial_pose = np.asarray(pose7, np.float64)
        return self

    def build(self, name: str) -> Articulation:
        from ..structs.pose import Pose as _P

        mb = self.scene.mb
        art = Articulation(self.scene, name)
        name_to_body: Dict[str, int] = {}
        prefix = f"{name}:"

        for spec in self.links:
            if spec.parent is None:
                parent_body = 0
                if self.fix_root_link:
                    jt = FIXED
                    pos, quat = self.initial_pose[:3], self.initial_pose[3:]
                else:
                    jt = FREE
                    pos, quat = np.zeros(3), np.array([1.0, 0, 0, 0])
            else:
                parent_body = name_to_body[spec.parent]
                jt = spec.joint_type
                pos, quat = np.asarray(spec.origin_pos), np.asarray(spec.origin_quat)

            # mass properties
            if spec.mass is not None:
                mass = spec.mass
                com = np.asarray(spec.com, np.float64)
                if spec.inertia is None:
                    inertia, iquat = np.full(3, 1e-6), np.array([1.0, 0, 0, 0])
                elif np.asarray(spec.inertia).ndim == 2:
                    inertia, iquat = diagonalize_inertia(np.asarray(spec.inertia))
                else:
                    inertia, iquat = np.asarray(spec.inertia, np.float64), np.asarray(
                        spec.iquat, np.float64
                    )
            else:
                shapes = []
                for c in spec.collisions:
                    if c.type == HULL and c.hull is not None:
                        # hull proxies use their AABB box equivalent for
                        # inertia (same convention as actor_builder)
                        v = np.asarray(c.hull, float)
                        half = 0.5 * (v.max(axis=0) - v.min(axis=0))
                        ctr = 0.5 * (v.max(axis=0) + v.min(axis=0))
                        shapes.append(
                            (BOX, np.maximum(half, 1e-4),
                             np.asarray(c.pos, float) + ctr,
                             np.asarray(c.quat, float), c.density)
                        )
                    else:
                        shapes.append(
                            (c.type, np.asarray(c.size, float),
                             np.asarray(c.pos, float),
                             np.asarray(c.quat, float), c.density)
                        )
                if shapes:
                    mass, com, inertia, iquat = combine_shapes(shapes)
                else:
                    mass, com, inertia, iquat = 1e-3, np.zeros(3), np.full(3, 1e-7), np.array(
                        [1.0, 0, 0, 0]
                    )

            body = mb.add_body(
                prefix + spec.name,
                parent=parent_body,
                jnt_type=jt,
                body_type=DYNAMIC,
                pos=pos,
                quat=quat,
                jnt_axis=np.asarray(spec.axis, np.float64),
                mass=float(mass),
                ipos=com,
                iquat=iquat,
                inertia=inertia,
                limit=spec.limit,
                damping=spec.damping,
                stiffness=spec.stiffness,
                springref=spec.springref,
                armature=spec.armature,
                frictionloss=spec.frictionloss,
                joint_name=spec.joint_name or (spec.name + "_joint"),
            )
            name_to_body[spec.name] = body

            contype, conaffinity = self.collision_groups
            for c in spec.collisions:
                mb.add_geom(
                    body, c.type, np.asarray(c.size, float), pos=c.pos, quat=c.quat,
                    friction=c.friction, contype=contype, conaffinity=conaffinity,
                    name=f"{prefix}{spec.name}_col_{len(mb.geoms)}", visual=False,
                    hull=c.hull, hull_dirs=c.hull_dirs,
                )
            for v in spec.visuals:
                mb.add_geom(
                    body, v.type, np.asarray(v.size, float), pos=v.pos, quat=v.quat,
                    collision=False, contype=0, conaffinity=0, color=v.color,
                    name=f"{prefix}{spec.name}_vis_{len(mb.geoms)}", mesh=v.mesh,
                    hull=v.hull, hull_dirs=v.hull_dirs,
                )

            link = Link(self.scene, spec.name, body, articulation=art, index=len(art.links))
            art.links.append(link)
            art.links_map[spec.name] = link
            if spec.parent is None:
                art.root = link
                art.fixed_root = self.fix_root_link

            jname = spec.joint_name or (spec.name + "_joint")
            joint = ArticulationJoint(
                self.scene, jname, body, jt if spec.parent is not None or not self.fix_root_link else FIXED,
                q_adr=-1, dof_adr=-1, active_index=None,
                parent_link=art.links_map.get(spec.parent) if spec.parent else None,
                child_link=link,
            )
            link.joint = joint
            art.joints.append(joint)
            art.joints_map[jname] = joint
            if joint.jnt_type in (HINGE, SLIDE):
                joint.active_index = len(art.active_joints)
                art.active_joints.append(joint)

        # self-collision filtering
        if self.disable_self_collisions:
            bodies = list(name_to_body.values())
            for i in range(len(bodies)):
                for j in range(i + 1, len(bodies)):
                    mb.exclude_collision(bodies[i], bodies[j])
        for n1, n2 in self.collision_exclude_pairs:
            mb.exclude_collision(name_to_body[n1], name_to_body[n2])

        self.scene.register_articulation(art)
        return art

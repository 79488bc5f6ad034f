"""``ManiSkillScene``: build-time scene construction + runtime state views.

Counterpart of mani_skill/envs/scene.py. The reference manages N sapien
sub-scenes sharing one PhysX GPU system; here a scene is one physics ``Model``
(kinematic forest shared by all envs) plus the current batched ``Data``
pytree. There is no apply/fetch protocol: struct setters functionally update
``scene.data`` (masked by the partial-reset mask), and the env jit-compiles
everything into one XLA program.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..physics import ModelBuilder, make_data
from ..physics.types import DYNAMIC, KINEMATIC, STATIC, FREE, Model
from ..structs.actor import Actor
from ..structs.articulation import Articulation, ArticulationJoint
from ..structs.link import Link
from ..structs.pose import Pose


class ManiSkillScene:
    def __init__(
        self,
        num_envs: int = 1,
        sim_timestep: float = 0.01,
        solver_iterations: int = 16,
        gravity=(0.0, 0.0, -9.81),
    ):
        self.num_envs = num_envs
        self.mb = ModelBuilder(
            timestep=sim_timestep,
            gravity=gravity,
            solver_iterations=solver_iterations,
        )
        self.actors: Dict[str, Actor] = {}
        self.articulations: Dict[str, Articulation] = {}
        self.sensors: Dict[str, object] = {}
        self.human_render_cameras: Dict[str, object] = {}
        self.lights: List[dict] = []
        self.model: Optional[Model] = None
        self._data = None
        self._reset_mask: Optional[jax.Array] = None
        self._next_seg_id = 1

    # -- build phase -----------------------------------------------------
    def create_actor_builder(self):
        from ..building.actor_builder import ActorBuilder

        return ActorBuilder(self)

    def create_articulation_builder(self):
        from ..building.articulation_builder import ArticulationBuilder

        return ArticulationBuilder(self)

    def create_urdf_loader(self):
        from ..building.urdf_loader import URDFLoader

        return URDFLoader(self)

    def create_mjcf_loader(self):
        from ..building.mjcf_loader import MJCFLoader

        return MJCFLoader(self)

    def create_drive(self, entity1, pose1, entity2, pose2,
                     stiffness=(1e3, 1e2), damping=(1e2, 1e1),
                     force_limit=(1e3, 1e3)):
        """Body-body 6-dof drive between two actors/links (reference
        scene.py:474-484 Drive.create_from_actors_or_links). entity1 may be
        None for a world-anchored drive."""
        from ..structs.drive import Drive

        def _p7(p):
            if p is None:
                return np.array([0, 0, 0, 1, 0, 0, 0], np.float32)
            a = np.asarray(p, np.float32).reshape(-1)
            if a.shape[0] == 3:
                a = np.concatenate([a, [1, 0, 0, 0]]).astype(np.float32)
            return a

        b1 = 0 if entity1 is None else entity1.body_id
        b2 = entity2.body_id
        did = self.mb.add_drive(
            b1, _p7(pose1), b2, _p7(pose2),
            stiffness=stiffness, damping=damping, force_limit=force_limit,
        )
        return Drive(self, did, b1, b2)

    def register_actor(self, actor: Actor):
        if actor.name in self.actors:
            raise ValueError(f"duplicate actor name {actor.name!r}")
        actor.per_scene_id = self._next_seg_id
        self._next_seg_id += 1
        self.actors[actor.name] = actor
        return actor

    def register_articulation(self, art: Articulation):
        if art.name in self.articulations:
            raise ValueError(f"duplicate articulation name {art.name!r}")
        for link in art.links:
            link.per_scene_id = self._next_seg_id
            self._next_seg_id += 1
        self.articulations[art.name] = art
        return art

    def add_light(self, kind: str, **kwargs):
        self.lights.append(dict(kind=kind, **kwargs))

    # lighting API parity (scene.py:566-718)
    def set_ambient_light(self, color):
        self.add_light("ambient", color=np.asarray(color, np.float32))

    def add_directional_light(self, direction, color=(1, 1, 1), **kw):
        self.add_light(
            "directional",
            direction=np.asarray(direction, np.float32),
            color=np.asarray(color, np.float32),
        )

    def add_point_light(self, position, color=(1, 1, 1), **kw):
        self.add_light(
            "point",
            position=np.asarray(position, np.float32),
            color=np.asarray(color, np.float32),
        )

    def finalize(self):
        """Compile builders to the flat Model and wire view indices."""
        self.model = self.mb.finalize()
        # host mirrors of build-time geometry (render mesh construction must
        # never read device arrays — see physics/types.py host_* fields)
        geoms = self.mb.geoms
        self.host_geom_size = (
            np.stack([np.asarray(g.size, np.float32) for g in geoms])
            if geoms
            else np.zeros((0, 3), np.float32)
        )
        from ..physics.types import HULL as _HULL

        hulls = [
            np.asarray(g.hull, np.float32) for g in geoms if g.type == _HULL
        ]
        self.host_hull_verts = np.stack(hulls) if hulls else None
        mocap_of = (
            {int(b): i for i, b in enumerate(self.model.mocap_bodies)}
            if self.model.mocap_bodies is not None
            else {}
        )
        for actor in self.actors.values():
            if actor.body_type != STATIC:
                if actor.body_id in mocap_of:
                    actor._mocap_idx = mocap_of[actor.body_id]
                else:
                    actor._q_adr = int(self.model.body_q_adr[actor.body_id])
                    actor._dof_adr = int(self.model.body_dof_adr[actor.body_id])
        for art in self.articulations.values():
            for j in art.joints:
                j.q_adr = int(self.model.body_q_adr[j.body_id])
                j.dof_adr = int(self.model.body_dof_adr[j.body_id])
            if not art.fixed_root:
                art.root_q_adr = int(self.model.body_q_adr[art.root.body_id])
                art.root_dof_adr = int(self.model.body_dof_adr[art.root.body_id])
            art._finalize_indices()
        return self.model

    # -- runtime ---------------------------------------------------------
    @property
    def data(self):
        return self._data

    @data.setter
    def data(self, d):
        self._data = d

    def bind(self, data):
        self._data = data
        return self

    def render_key(self) -> jax.Array:
        """Per-call PRNG key for stochastic shaders (rt sampling jitter).
        Derived from the qpos state so each physics state gets fresh sample
        jitter while the render stays a pure function of the sim state."""
        import jax.random

        seed = jnp.sum(
            jax.lax.bitcast_convert_type(
                self.data.qpos[:, :1].ravel(), jnp.int32
            )
        ).astype(jnp.uint32)
        return jax.random.fold_in(jax.random.PRNGKey(7), seed)

    def masked(self, new: jax.Array, cur: jax.Array) -> jax.Array:
        """Apply the partial-reset mask to a pending write (scene.py:950-986
        reset-mask semantics, expressed functionally)."""
        if self._reset_mask is None:
            return new
        m = self._reset_mask
        m = m.reshape(m.shape + (1,) * (new.ndim - 1))
        return jnp.where(m, new, cur)

    # -- heterogeneous per-env parameters --------------------------------
    # The reference fakes per-env assets through Actor.merge views over PhysX
    # buffers (actor.py:99-126); here physical parameter tables natively
    # broadcast over the env axis: promote a field to (B, ...) and scatter.
    def set_per_env_geom_sizes(self, actor, sizes):
        """sizes: (B, n_geoms_of_actor, 3) or (B, 3) for single-geom actors."""
        return self.set_per_env_geom_sizes_by_id(actor.geom_ids, sizes)

    def set_per_env_geom_sizes_by_id(self, geom_ids, sizes):
        """sizes: (B, K, 3) (or (B, 3) for K==1) for explicit geom ids."""
        m = self.model
        gids = np.asarray(geom_ids, np.int32)
        gs = m.geom_size
        if gs.ndim == 2:
            gs = jnp.broadcast_to(gs, (self.num_envs,) + gs.shape)
        sizes_np = np.asarray(sizes, np.float32)  # pass host arrays here
        if sizes_np.ndim == 2:
            sizes_np = sizes_np[:, None, :]
        sizes = jnp.asarray(sizes_np)
        self.model = m.replace(geom_size=gs.at[:, gids].set(sizes))
        hs = self.host_geom_size
        if hs.ndim == 2:
            hs = np.broadcast_to(hs, (self.num_envs,) + hs.shape).copy()
        hs[:, gids] = sizes_np
        self.host_geom_size = hs

    def set_per_env_hulls(self, actor, hulls, dirs=None):
        """Per-env convex hull geometry for one actor (heterogeneous objects,
        the reference's PickSingleYCB Actor.merge pattern,
        pick_single_ycb.py:146-149).

        hulls: (B, K, HULL_MAX_VERTS, 3) local vertex clouds for the actor's
        K HULL geoms; dirs: optional (B, K, HULL_MAX_DIRS, 3) facet normals
        (computed from the hulls when omitted).
        """
        import numpy as np

        from ..building.cooking import hull_face_dirs

        m = self.model
        gids = [
            g for g in actor.geom_ids if int(np.asarray(m.geom_hull)[g]) >= 0
        ]
        hids = np.asarray(m.geom_hull)[gids]
        hulls_np = np.asarray(hulls, np.float32)  # pass host arrays here
        if len(hids) != hulls_np.shape[1] and len(hids) % hulls_np.shape[1] == 0:
            # the actor exposes its hulls twice (collision geoms + HULL
            # visual geoms added from the same specs, in order): tile so
            # visuals track the per-env physics geometry
            reps = len(hids) // hulls_np.shape[1]
            hulls_np = np.tile(hulls_np, (1, reps, 1, 1))
            if dirs is not None:
                dirs = np.tile(np.asarray(dirs, np.float32), (1, reps, 1, 1))
        hulls = jnp.asarray(hulls_np)
        assert hulls.shape[1] == len(hids), (hulls.shape, len(hids))
        hvh = self.host_hull_verts
        if hvh is not None:
            if hvh.ndim == 3:
                hvh = np.broadcast_to(
                    hvh, (self.num_envs,) + hvh.shape
                ).copy()
            hvh[:, hids] = hulls_np
            self.host_hull_verts = hvh
        if dirs is None:
            hv = hulls_np
            dirs = np.stack(
                [
                    np.stack([hull_face_dirs(hv[b, k]) for k in range(hv.shape[1])])
                    for b in range(hv.shape[0])
                ]
            )
        dirs = jnp.asarray(dirs, jnp.float32)
        hvt = m.hull_verts
        hdt = m.hull_dirs
        if hvt.ndim == 3:
            hvt = jnp.broadcast_to(hvt, (self.num_envs,) + hvt.shape)
        if hdt.ndim == 3:
            hdt = jnp.broadcast_to(hdt, (self.num_envs,) + hdt.shape)
        self.model = m.replace(
            hull_verts=hvt.at[:, hids].set(hulls),
            hull_dirs=hdt.at[:, hids].set(dirs),
        )

    def set_per_env_body_mass(self, actor, mass):
        """mass: (B,) dynamic-randomized masses for one body."""
        m = self.model
        bm = m.body_mass
        if bm.ndim == 1:
            bm = jnp.broadcast_to(bm, (self.num_envs,) + bm.shape)
        self.model = m.replace(
            body_mass=bm.at[:, actor.body_id].set(jnp.asarray(mass, jnp.float32))
        )

    def set_per_env_body_pos(self, body_ids, pos):
        """Per-env joint-frame origins (heterogeneous articulated assets:
        drawer heights / hinge positions vary per env — the reference's
        PartNet-Mobility cabinet sampling, open_cabinet_drawer.py:134-176).

        body_ids: (K,) int; pos: (B, K, 3) host array."""
        m = self.model
        bp = m.body_pos
        if bp.ndim == 2:
            bp = jnp.broadcast_to(bp, (self.num_envs,) + bp.shape)
        bids = np.asarray(body_ids, np.int32)
        self.model = m.replace(
            body_pos=bp.at[:, bids].set(jnp.asarray(pos, jnp.float32))
        )

    def set_per_env_geom_pos(self, geom_ids, pos):
        """Per-env geom offsets in the body frame. geom_ids: (K,); pos (B,K,3)."""
        m = self.model
        gp = m.geom_pos
        if gp.ndim == 2:
            gp = jnp.broadcast_to(gp, (self.num_envs,) + gp.shape)
        gids = np.asarray(geom_ids, np.int32)
        self.model = m.replace(
            geom_pos=gp.at[:, gids].set(jnp.asarray(pos, jnp.float32))
        )

    def set_per_env_dof_limits(self, dof_adrs, limits):
        """Per-env joint limits; locking a dof to [0, 0] disables it — the
        static-shape realization of per-env link/DoF structure (absent
        drawers/doors are locked slots of the union template).

        dof_adrs: (K,) int; limits: (B, K, 2) host array."""
        m = self.model
        dl = m.dof_limit
        if dl.ndim == 2:
            dl = jnp.broadcast_to(dl, (self.num_envs,) + dl.shape)
        adrs = np.asarray(dof_adrs, np.int32)
        assert bool(
            np.asarray(m.dof_limited)[adrs].all()
        ), "per-env limits require dofs marked limited at build time"
        self.model = m.replace(
            dof_limit=dl.at[:, adrs].set(jnp.asarray(limits, jnp.float32))
        )

    def set_per_env_friction(self, actor, friction):
        """friction: (B,) or (B, n_geoms) per-env friction for an actor."""
        m = self.model
        gf = m.geom_friction
        if gf.ndim == 1:
            gf = jnp.broadcast_to(gf, (self.num_envs,) + gf.shape)
        gids = actor.geom_ids
        f = jnp.asarray(friction, jnp.float32)
        if f.ndim == 1:
            f = jnp.broadcast_to(f[:, None], (self.num_envs, len(gids)))
        self.model = m.replace(geom_friction=gf.at[:, gids].set(f))

    # -- task extras: persistent per-env state ---------------------------
    def register_extra(self, name: str, shape=(), dtype=jnp.float32):
        """Declare a persistent per-env task variable (zero-initialized,
        masked on partial reset)."""
        if not hasattr(self, "extra_specs"):
            self.extra_specs = {}
        self.extra_specs[name] = (tuple(shape), dtype)

    def get_extra(self, name: str) -> jax.Array:
        return self._data.extras[name]

    def set_extra(self, name: str, value: jax.Array, masked: bool = True):
        d = self._data
        cur = d.extras[name]
        new = self.masked(jnp.broadcast_to(value, cur.shape), cur) if masked else value
        extras = dict(d.extras)
        extras[name] = new
        self._data = d.replace(extras=extras)

    def set_drive_properties(self, dof_adrs, stiffness, damping, force_limit=np.inf):
        """Update PD gains in the model (controllers call this at setup)."""
        adr = np.asarray(dof_adrs, np.int32)
        m = self.model
        self.model = m.replace(
            drive_kp=m.drive_kp.at[adr].set(jnp.asarray(stiffness, jnp.float32)),
            drive_kd=m.drive_kd.at[adr].set(jnp.asarray(damping, jnp.float32)),
            drive_force_limit=m.drive_force_limit.at[adr].set(
                jnp.asarray(force_limit, jnp.float32)
            ),
        )

    # -- contact queries (scene.py:741-801 parity) -----------------------
    def _body_ids_of(self, obj) -> List[int]:
        if isinstance(obj, Actor):
            return [obj.body_id]
        if isinstance(obj, Link):
            return [obj.body_id]
        if isinstance(obj, Articulation):
            return [l.body_id for l in obj.links]
        raise TypeError(type(obj))

    def net_contact_forces_for_bodies(self, body_ids: Sequence[int]) -> jax.Array:
        c = self._data.contact
        if c is None or len(c.geom1) == 0:
            return jnp.zeros((self.num_envs, 3), jnp.float32)
        gb = np.asarray(self.model.geom_body)
        b1, b2 = gb[np.asarray(c.geom1)], gb[np.asarray(c.geom2)]
        ids = set(int(i) for i in body_ids)
        sign = np.array(
            [(1.0 if int(b) in ids else 0.0) for b in b2], np.float32
        ) - np.array([(1.0 if int(b) in ids else 0.0) for b in b1], np.float32)
        if not np.any(sign):
            return jnp.zeros((self.num_envs, 3), jnp.float32)
        imp = c.impulse * jnp.asarray(sign)[None, :, None]
        return jnp.sum(imp, axis=1) / self.model.timestep

    def get_pairwise_contact_forces(self, obj1, obj2) -> jax.Array:
        """Force exerted by obj1 on obj2, (B, 3)."""
        c = self._data.contact
        if c is None or len(c.geom1) == 0:
            return jnp.zeros((self.num_envs, 3), jnp.float32)
        gb = np.asarray(self.model.geom_body)
        b1, b2 = gb[np.asarray(c.geom1)], gb[np.asarray(c.geom2)]
        a = set(self._body_ids_of(obj1))
        b = set(self._body_ids_of(obj2))
        sign = np.zeros(len(b1), np.float32)
        for i in range(len(b1)):
            if int(b1[i]) in a and int(b2[i]) in b:
                sign[i] = 1.0  # impulse acts on body2 (obj2)
            elif int(b1[i]) in b and int(b2[i]) in a:
                sign[i] = -1.0  # reaction
        if not np.any(sign):
            return jnp.zeros((self.num_envs, 3), jnp.float32)
        imp = c.impulse * jnp.asarray(sign)[None, :, None]
        return jnp.sum(imp, axis=1) / self.model.timestep

    # -- sim state registry (scene.py:824-897 parity) --------------------
    def get_sim_state(self) -> Dict:
        state = dict(actors={}, articulations={})
        for name, actor in self.actors.items():
            if actor.is_static:
                continue
            state["actors"][name] = actor.get_state()
        for name, art in self.articulations.items():
            state["articulations"][name] = art.get_state()
        return state

    def set_sim_state(self, state: Dict):
        for name, s in state.get("actors", {}).items():
            self.actors[name].set_state(s)
        for name, s in state.get("articulations", {}).items():
            self.articulations[name].set_state(s)

"""Batched triangle rasterizer in pure JAX.

Replaces the reference's Vulkan RenderSystemGroup camera groups (SURVEY.md
§2.1): all (num_envs x num_cams) views render in one batched program reading
the body poses the physics step just wrote in HBM (no sim->render copy).

Algorithm: vertex transform -> clip -> per-face-chunk edge-function coverage
with a running z-buffer. Face chunking bounds peak memory; XLA fuses the
per-chunk work into VPU-friendly elementwise ops. A Pallas tiled version can
swap in behind the same interface for peak throughput.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import rotation_conversions as rc

FACE_CHUNK = 64


def _spread3(x: np.ndarray) -> np.ndarray:
    """Spread 10 bits of x so consecutive bits land 3 apart (Morton)."""
    x = x.astype(np.int64) & 0x3FF
    x = (x | (x << 16)) & 0x030000FF
    x = (x | (x << 8)) & 0x0300F00F
    x = (x | (x << 4)) & 0x030C30C3
    x = (x | (x << 2)) & 0x09249249
    return x


def _spatial_face_order(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Morton order of face centroids (local coords).

    The Pallas rasterizer bins faces in GROUPs of 8 consecutive records;
    spatially sorted faces make each group a tight surface patch whose
    screen-space y-span stays small under any camera, so per-band group
    lists stay short. Static per-mesh, zero per-frame cost."""
    cen = np.asarray(verts, np.float64)[np.asarray(faces)].mean(axis=1)
    lo = cen.min(axis=0)
    ext = np.maximum(cen.max(axis=0) - lo, 1e-9)
    q = np.clip(((cen - lo) / ext) * 1023.0, 0, 1023).astype(np.int64)
    code = (_spread3(q[:, 0]) << 2) | (_spread3(q[:, 1]) << 1) | _spread3(q[:, 2])
    return np.argsort(code, kind="stable")


class SceneMesh:
    """Static scene geometry compiled for rendering.

    Per-geom unit meshes are concatenated; verts are stored in geom-local
    coords with a per-vertex geom index so world transform is one gather +
    quaternion rotate per frame.
    """

    def __init__(self, verts, faces, vert_geom, face_geom, face_color, face_seg,
                 verts_b=None):
        self.verts = jnp.asarray(verts)  # (V, 3) local (shared across envs)
        self.faces = jnp.asarray(faces)  # (F, 3) vertex ids
        self.vert_geom = np.asarray(vert_geom)  # (V,) geom id (static)
        self.face_geom = np.asarray(face_geom)  # (F,)
        self.face_color = jnp.asarray(face_color)  # (F, 3) float
        self.face_seg = jnp.asarray(face_seg)  # (F,) int32
        self.num_faces = int(faces.shape[0])
        # optional per-env local verts (B, V, 3) for heterogeneous geometry
        # (per-env hull objects); overrides `verts` when present
        self.verts_b = None if verts_b is None else jnp.asarray(verts_b)

    @classmethod
    def build(cls, model, scene, exclude_body_ids=()):
        """Compile all visual geoms of a scene into one mesh set."""
        from .meshes import geom_mesh
        from ..physics.types import PLANE

        verts_l, faces_l, vgeom_l, fgeom_l, fcol_l, fseg_l = [], [], [], [], [], []
        voff = 0
        # host mirrors: render mesh construction runs at gym.make time and
        # must not synchronize device->host
        geom_size = getattr(scene, "host_geom_size", None)
        if geom_size is None:
            geom_size = np.asarray(model.geom_size)
        # geom -> segmentation id (per_scene_id of owning actor/link)
        seg_of_body = {}
        for actor in scene.actors.values():
            seg_of_body[actor.body_id] = actor.per_scene_id or 0
        for art in scene.articulations.values():
            for link in art.links:
                seg_of_body[link.body_id] = link.per_scene_id or 0

        from ..physics.types import HULL

        hull_verts = getattr(scene, "host_hull_verts", None)
        if hull_verts is None and model.hull_verts is not None:
            hull_verts = np.asarray(model.hull_verts)
        geom_hull = model.geom_hull
        verts_b = None  # set when any hull table is per-env (B, NH, V, 3)

        for g, gdef in enumerate(scene.mb.geoms):
            if not gdef.visual:
                continue
            if gdef.body in exclude_body_ids:
                continue
            if gdef.mesh is not None:
                v, f = gdef.mesh
                v = np.asarray(v, np.float32)
                f = np.asarray(f, np.int32)
            elif gdef.type == HULL and hull_verts is not None:
                from ..building.cooking import support_morph_mesh

                hid = int(geom_hull[g])
                hv = hull_verts[..., hid, :, :]  # (V,3) or (B,V,3)
                v, f = support_morph_mesh(hv)
                if v.ndim == 3:  # per-env verts
                    if verts_b is None:
                        verts_b = []
                    verts_b.append((voff, v))
                    v0 = v[0]
                    v = v0  # placeholder row in the shared table
            elif geom_size.ndim == 3:
                # heterogeneous per-env primitive sizes (scene
                # set_per_env_geom_sizes): same topology, per-env verts
                sizes = geom_size[:, g]
                v, f = geom_mesh(gdef.type, sizes[0])
                if not (sizes == sizes[0]).all():
                    vb = np.stack(
                        [geom_mesh(gdef.type, s)[0] for s in sizes]
                    )  # (B, V, 3)
                    if verts_b is None:
                        verts_b = []
                    verts_b.append((voff, vb))
            else:
                v, f = geom_mesh(gdef.type, geom_size[g])
            fc = getattr(gdef, "face_colors", None)
            if fc is not None and len(fc) == len(f):
                # baked texture: per-face centroid samples (render/textures.py)
                fc = np.asarray(fc, np.float32)
            else:
                color = np.asarray(gdef.color[:3], np.float32)
                fc = np.tile(color, (len(f), 1))
            if len(f) > 8:
                # spatial (Morton) face order: keeps the Pallas binner's
                # 8-face groups to tight surface patches. Per-env hulls
                # (v.ndim == 3) order by the across-env MEAN hull so no
                # single env's geometry dominates when variants diverge
                # (e.g. per-env YCB hulls in RotateSingleObjectInHand L3).
                order = _spatial_face_order(
                    v if v.ndim == 2 else v.mean(axis=0), f
                )
                f = f[order]
                fc = fc[order]
            verts_l.append(v)
            faces_l.append(f + voff)
            vgeom_l.append(np.full(len(v), g, np.int32))
            fgeom_l.append(np.full(len(f), g, np.int32))
            fcol_l.append(fc)
            fseg_l.append(np.full(len(f), seg_of_body.get(gdef.body, 0), np.int32))
            voff += len(v)

        if not verts_l:
            verts_l = [np.zeros((3, 3), np.float32)]
            faces_l = [np.zeros((1, 3), np.int32)]
            vgeom_l = [np.zeros(3, np.int32)]
            fgeom_l = [np.zeros(1, np.int32)]
            fcol_l = [np.zeros((1, 3), np.float32)]
            fseg_l = [np.zeros(1, np.int32)]
        all_verts = np.concatenate(verts_l)
        vb = None
        if verts_b is not None:
            # promote the whole local-vert table to (B, V, 3), patch hull spans
            B = next(v.shape[0] for _, v in verts_b)
            vb = np.broadcast_to(all_verts[None], (B,) + all_verts.shape).copy()
            for off, v in verts_b:
                vb[:, off : off + v.shape[1]] = v
        return cls(
            all_verts,
            np.concatenate(faces_l),
            np.concatenate(vgeom_l),
            np.concatenate(fgeom_l),
            np.concatenate(fcol_l),
            np.concatenate(fseg_l),
            verts_b=vb,
        )

    def world_vertices(self, gpos: jax.Array, gquat: jax.Array) -> jax.Array:
        """Transform local verts to world: gpos/gquat (B, ngeom, ...)."""
        vp = gpos[:, self.vert_geom]  # (B, V, 3)
        vq = gquat[:, self.vert_geom]
        local = self.verts[None] if self.verts_b is None else self.verts_b
        return vp + rc.quaternion_apply(vq, local)


def look_at_matrix(eye, target, up=(0, 0, 1)) -> np.ndarray:
    """World->camera (OpenGL convention: -z forward) 4x4 view matrix."""
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    m = np.eye(4)
    m[0, :3], m[1, :3], m[2, :3] = right, true_up, -fwd
    m[:3, 3] = -m[:3, :3] @ eye
    return m


def perspective_matrix(fov: float, aspect: float, near: float, far: float) -> np.ndarray:
    f = 1.0 / np.tan(fov / 2)
    m = np.zeros((4, 4))
    m[0, 0] = f / aspect
    m[1, 1] = f
    m[2, 2] = (far + near) / (near - far)
    m[2, 3] = 2 * far * near / (near - far)
    m[3, 2] = -1.0
    return m


def rasterize(
    mesh: SceneMesh,
    world_verts: jax.Array,  # (B, V, 3)
    view: jax.Array,  # (B, 4, 4) world->camera (GL)
    proj: jax.Array,  # (4, 4) or (B, 4, 4)
    height: int,
    width: int,
    face_mask: Optional[np.ndarray] = None,  # (F,) static visibility
    lights: Optional[List[dict]] = None,
    want_normal: bool = False,
    want_albedo: bool = False,
) -> Dict[str, jax.Array]:
    """Render color/depth/segmentation buffers for B views.

    Returns dict with:
      depth (B, H, W) float32 camera-space depth in meters (0 = background)
      seg (B, H, W) int32 per-pixel segmentation id (0 = background)
      valid (B, H, W) bool foreground mask
      color (B, H, W, 3) float32 in [0,1]
      dropped () int32 — faces dropped by the binned fast path's per-band
      budget (0 on the jnp path); callers should surface a warning if >0
    """
    B, V, _ = world_verts.shape
    F = mesh.num_faces

    vh = jnp.concatenate([world_verts, jnp.ones((B, V, 1), world_verts.dtype)], -1)
    cam = jnp.einsum("bij,bvj->bvi", view, vh)  # camera space
    clip = jnp.einsum("ij,bvj->bvi", proj, cam) if proj.ndim == 2 else jnp.einsum(
        "bij,bvj->bvi", proj, cam
    )
    w = clip[..., 3:4]
    w_safe = jnp.where(jnp.abs(w) < 1e-6, 1e-6, w)
    ndc = clip[..., :3] / w_safe
    # screen coords (pixel centers)
    sx = (ndc[..., 0] * 0.5 + 0.5) * width
    sy = (0.5 - ndc[..., 1] * 0.5) * height
    # camera-space depth (positive distance along view dir)
    zcam = -cam[..., 2]
    in_front = zcam > 1e-4

    fv = np.asarray(mesh.faces)  # (F, 3) static
    # gather per-face vertex attributes: (B, F, 3)
    def gather(x):
        return x[:, fv]  # (B, F, 3vert, ...)

    fx, fy, fz = gather(sx), gather(sy), gather(zcam)
    ffront = gather(in_front)

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    px = xs[None, :]  # (1, W)
    py = ys[:, None]  # (H, 1)

    big = jnp.float32(1e9)
    zbuf = jnp.full((B, height, width), big, jnp.float32)
    fbuf = jnp.full((B, height, width), -1, jnp.int32)

    fmask_np = (
        np.ones(F, bool) if face_mask is None else np.asarray(face_mask, bool)
    )

    # Pallas fast path: binned bands + in-kernel flat shading (see
    # pallas_rasterizer.py); falls back to the chunked jnp path on CPU or
    # non-tile-aligned sizes.
    import os

    from .pallas_rasterizer import pallas_available, pallas_rasterize_tiles

    # normal/albedo ride the jnp shading tail (the "default" shader pack's
    # extra float textures, render/shaders.py:89-105); the pallas in-kernel
    # path covers the hot rgb/depth/seg contract
    use_pallas = not (want_normal or want_albedo)
    if use_pallas and pallas_available(height, width, F) and os.environ.get("MS_PALLAS_RENDER", "1") == "1":
        # backface culling: consistent outward winding means front faces
        # have negative signed area in (y-down) screen coords — drops ~55%
        # of faces before binning (verified pixel-exact)
        area2 = (fx[..., 1] - fx[..., 0]) * (fy[..., 2] - fy[..., 0]) - (
            fx[..., 2] - fx[..., 0]
        ) * (fy[..., 1] - fy[..., 0])
        ok = (
            ffront.all(-1)
            & jnp.asarray(fmask_np)[None]
            & (area2 < 0.0)
        ).astype(jnp.int32)
        inv_z = 1.0 / jnp.maximum(fz, 1e-6)
        face_rgb = _face_rgb(mesh, world_verts, lights)
        zbuf, seg, rgb, dropped = pallas_rasterize_tiles(
            fx, fy, inv_z, ok, face_rgb, jnp.asarray(mesh.face_seg, jnp.int32),
            height, width,
        )
        valid = seg >= 0
        return dict(
            depth=jnp.where(valid, zbuf, 0.0),
            seg=jnp.where(valid, seg, 0),
            valid=valid,
            color=rgb,
            dropped=dropped,
        )

    # memory-adaptive face chunking: the coverage intermediates are
    # (B, chunk, H, W) f32 — keep them under ~256 MB
    budget = 64 * 1024 * 1024  # elements
    chunk = max(4, min(FACE_CHUNK, budget // max(1, B * height * width)))

    # backface + facing handled implicitly (area sign); render both sides
    n_chunks = (F + chunk - 1) // chunk
    for c in range(n_chunks):
        lo, hi = c * chunk, min((c + 1) * chunk, F)
        if not fmask_np[lo:hi].any():
            continue
        x0, x1, x2 = fx[:, lo:hi, 0], fx[:, lo:hi, 1], fx[:, lo:hi, 2]
        y0, y1, y2 = fy[:, lo:hi, 0], fy[:, lo:hi, 1], fy[:, lo:hi, 2]
        z0, z1, z2 = fz[:, lo:hi, 0], fz[:, lo:hi, 1], fz[:, lo:hi, 2]
        ok = ffront[:, lo:hi].all(-1) & jnp.asarray(fmask_np[lo:hi])[None]

        # edge functions at all pixels: (B, f, H, W)
        def edge(ax, ay, bx, by):
            return (bx[..., None, None] - ax[..., None, None]) * (
                py[None, None] - ay[..., None, None]
            ) - (by[..., None, None] - ay[..., None, None]) * (
                px[None, None] - ax[..., None, None]
            )

        e01 = edge(x0, y0, x1, y1)
        e12 = edge(x1, y1, x2, y2)
        e20 = edge(x2, y2, x0, y0)
        area = (
            (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        )[..., None, None]
        area_safe = jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)
        # inside if all edges same sign as area
        s = jnp.sign(area_safe)
        inside = (e01 * s >= 0) & (e12 * s >= 0) & (e20 * s >= 0)
        inside = inside & ok[..., None, None] & (jnp.abs(area) > 1e-9)

        # perspective-correct-ish depth via barycentric on 1/z
        b0 = e12 / area_safe
        b1 = e20 / area_safe
        b2 = e01 / area_safe
        inv_z = (
            b0 / z0[..., None, None]
            + b1 / z1[..., None, None]
            + b2 / z2[..., None, None]
        )
        z = 1.0 / jnp.maximum(inv_z, 1e-9)
        z = jnp.where(inside, z, big)

        # reduce within the chunk
        zmin = jnp.min(z, axis=1)  # (B, H, W)
        amin = jnp.argmin(z, axis=1).astype(jnp.int32) + lo  # face ids
        better = zmin < zbuf
        zbuf = jnp.where(better, zmin, zbuf)
        fbuf = jnp.where(better, amin, fbuf)

    return _shade(mesh, world_verts, zbuf, fbuf, B, height, width, lights,
                  want_normal=want_normal, want_albedo=want_albedo)


def _face_rgb(mesh, world_verts, lights) -> jax.Array:
    """Per-face flat lambertian color (B, F, 3)."""
    fv = np.asarray(mesh.faces)
    v0 = world_verts[:, fv[:, 0]]
    v1w = world_verts[:, fv[:, 1]]
    v2w = world_verts[:, fv[:, 2]]
    fn = jnp.cross(v1w - v0, v2w - v0)
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-9)

    ambient = jnp.asarray([0.35, 0.35, 0.35], jnp.float32)
    light_dirs = []
    light_cols = []
    if lights:
        for l in lights:
            if l["kind"] == "ambient":
                ambient = jnp.asarray(l["color"], jnp.float32)
            elif l["kind"] == "directional":
                d = np.asarray(l["direction"], np.float32)
                light_dirs.append(-d / max(np.linalg.norm(d), 1e-9))
                light_cols.append(np.asarray(l["color"], np.float32))
    if not light_dirs:
        light_dirs = [np.array([0.4, 0.3, 0.85], np.float32)]
        light_cols = [np.array([0.7, 0.7, 0.7], np.float32)]

    shade = jnp.broadcast_to(ambient, fn.shape)
    for d, cl in zip(light_dirs, light_cols):
        lam = jnp.abs(fn @ jnp.asarray(d))  # two-sided
        shade = shade + lam[..., None] * jnp.asarray(cl)
    return jnp.clip(mesh.face_color[None] * shade, 0.0, 1.0)  # (B, F, 3)


def _shade(mesh, world_verts, zbuf, fbuf, B, height, width, lights,
           want_normal=False, want_albedo=False):
    """Shading tail of the jnp path: flat color + segmentation (+ optional
    world-space normals and unlit albedo) from the face-id buffer via one
    one-hot contraction."""
    background = fbuf < 0
    fidx = jnp.maximum(fbuf, 0)
    face_rgb = _face_rgb(mesh, world_verts, lights)

    # one-hot matmul gather: XLA's native gather is ~20x slower on TPU when
    # the operand is produced in the same program (measured 145ms vs 7ms per
    # 1024x128^2 frame); the (HW, F) one-hot contraction rides the MXU.
    # Color and segmentation share ONE one-hot by concatenating channels.
    F = face_rgb.shape[1]
    oh = jax.nn.one_hot(fidx.reshape(B, -1), F, dtype=face_rgb.dtype)
    attrs = [
        face_rgb,
        jnp.asarray(mesh.face_seg, jnp.float32)[None, :, None].repeat(B, 0),
    ]
    if want_normal or want_albedo:
        fv = np.asarray(mesh.faces)
        v0 = world_verts[:, fv[:, 0]]
        fn = jnp.cross(
            world_verts[:, fv[:, 1]] - v0, world_verts[:, fv[:, 2]] - v0
        )
        fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-9)
        attrs.append(fn)  # 3 channels
        attrs.append(jnp.broadcast_to(mesh.face_color[None], (B, F, 3)))
    attr = jnp.concatenate(attrs, axis=-1)  # (B, F, 4[+6])
    C = attr.shape[-1]
    pix = jnp.einsum("bpf,bfc->bpc", oh, attr).reshape(B, height, width, C)
    pix_rgb = jnp.where(background[..., None], 0.0, pix[..., :3])
    seg = jnp.where(background, 0, pix[..., 3].astype(jnp.int32))

    depth = jnp.where(background, 0.0, zbuf)
    out = dict(
        depth=depth,
        seg=seg,
        valid=~background,
        color=pix_rgb,
        dropped=jnp.zeros((), jnp.int32),
    )
    if want_normal or want_albedo:
        out["normal"] = jnp.where(background[..., None], 0.0, pix[..., 4:7])
        out["albedo"] = jnp.where(background[..., None], 0.0, pix[..., 7:10])
    return out

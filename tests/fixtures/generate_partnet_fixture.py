"""Generate the committed PartNet-Mobility-schema fixtures.

Produces tests/fixtures/partnet_mobility/ in the REAL dataset layout
(dataset/<id>/mobility_cvx.urdf + part OBJ meshes + meta/info_*.json) so the
real-asset ingestion path (building/articulations/partnet_mobility.py) is
exercised by tests without the downloaded dataset. Mesh units mimic raw
PartNet (unnormalized) so the meta ``scale`` is load-bearing.

Three models with DIFFERENT topologies exercise per-env heterogeneous
real-asset articulations (the reference samples a different model per
sub-scene, mani_skill/envs/tasks/mobile_manipulation/open_cabinet_drawer.py:134-176):
  90001: shell + 1 drawer + 1 door (right hinge)  [scale 0.5]
  90002: shell + 2 stacked drawers                [scale 0.4]
  90003: shell + 2 doors (left + right hinge)     [scale 0.45]

Run from the repo root: python tests/fixtures/generate_partnet_fixture.py
"""
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "partnet_mobility")


def box_obj_lines(center, half):
    cx, cy, cz = center
    hx, hy, hz = half
    v = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                v.append((cx + sx * hx, cy + sy * hy, cz + sz * hz))
    f = [
        (1, 2, 4), (1, 4, 3),  # -x
        (5, 7, 8), (5, 8, 6),  # +x
        (1, 5, 6), (1, 6, 2),  # -y
        (3, 4, 8), (3, 8, 7),  # +y
        (1, 3, 7), (1, 7, 5),  # -z
        (2, 6, 8), (2, 8, 4),  # +z
    ]
    return v, f


def multi_box_obj(boxes) -> str:
    """Several boxes in one OBJ (PartNet parts are multi-piece meshes)."""
    out, off = [], 0
    for center, half in boxes:
        v, _ = box_obj_lines(center, half)
        out += [f"v {x:.6f} {y:.6f} {z:.6f}" for x, y, z in v]
    for center, half in boxes:
        _, f = box_obj_lines(center, half)
        out += [f"f {a + off} {b + off} {c + off}" for a, b, c in f]
        off += 8
    return "\n".join(out) + "\n"


LINK = """  <link name="{name}">
    <visual name="{vis}">
      <origin xyz="0 0 0"/>
      <geometry><mesh filename="textured_objs/{obj}"/></geometry>
    </visual>
    <collision>
      <origin xyz="0 0 0"/>
      <geometry><mesh filename="textured_objs/{obj}"/></geometry>
    </collision>
    <inertial>
      <origin xyz="0 0 0"/>
      <mass value="{mass}"/>
      <inertia ixx="{I}" iyy="{I}" izz="{I}" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
"""

JOINT = """  <joint name="{name}" type="{jtype}">
    <origin xyz="{ox} {oy} {oz}"/>
    <parent link="{parent}"/>
    <child link="{child}"/>
    {axis_limit}
  </joint>
"""


def write_model(mid, scale, shell_dims, parts, kind):
    """parts: list of (kind, origin, axis, limit, boxes)."""
    hx, hy, hz = shell_dims
    W = 0.03
    mdir = os.path.join(ROOT, "dataset", mid, "textured_objs")
    os.makedirs(mdir, exist_ok=True)

    shell = [
        ((0, 0, hz - W), (hx, hy, W)),
        ((0, 0, -hz + W), (hx, hy, W)),
        ((0, -hy + W, 0), (hx, W, hz)),
        ((0, hy - W, 0), (hx, W, hz)),
        ((-hx + W, 0, 0), (W, hy, hz)),
    ]
    with open(os.path.join(mdir, "original-1.obj"), "w") as f:
        f.write(multi_box_obj(shell))

    urdf = ['<?xml version="1.0"?>', f'<robot name="partnet_{mid}">',
            '  <link name="base"/>']
    urdf.append(LINK.format(name="link_0", vis="shell", obj="original-1.obj",
                            mass=8.0, I=0.4))
    urdf.append(JOINT.format(
        name="joint_0", jtype="fixed", ox=0, oy=0, oz=hz,
        parent="base", child="link_0", axis_limit="",
    ))
    for i, (pkind, origin, axis, limit, boxes) in enumerate(parts, start=1):
        obj = f"original-{i + 1}.obj"
        with open(os.path.join(mdir, obj), "w") as f:
            f.write(multi_box_obj(boxes))
        urdf.append(LINK.format(name=f"link_{i}", vis=pkind, obj=obj,
                                mass=2.0, I=0.05))
        jtype = "prismatic" if pkind == "drawer" else "revolute"
        al = (
            f'<axis xyz="{axis[0]} {axis[1]} {axis[2]}"/>\n    '
            f'<limit lower="{limit[0]}" upper="{limit[1]}" effort="100" velocity="1"/>\n    '
            f'<dynamics damping="{5.0 if pkind == "drawer" else 2.0}"/>'
        )
        urdf.append(JOINT.format(
            name=f"joint_{i}", jtype=jtype,
            ox=origin[0], oy=origin[1], oz=origin[2],
            parent="link_0", child=f"link_{i}", axis_limit=al,
        ))
    urdf.append("</robot>\n")
    with open(os.path.join(ROOT, "dataset", mid, "mobility_cvx.urdf"), "w") as f:
        f.write("\n".join(urdf))
    return {
        "scale": scale,
        "kind": kind,
        "bbox": {"min": [-hx, -hy, -hz], "max": [hx + 0.1, hy, hz]},
    }


def main():
    os.makedirs(os.path.join(ROOT, "meta"), exist_ok=True)
    W = 0.03
    meta = {}

    # 90001: 1 drawer (upper) + 1 door (lower, right hinge) — same shapes the
    # original single-model fixture used (tests assert its numbers)
    hx, hy, hz = 0.4, 0.5, 0.7
    drawer = [
        ((0, 0, 0), (hx - 2 * W, hy - 3 * W, 0.3)),
        ((hx - W, 0, 0), (W, hy - 2 * W, 0.32)),
        ((hx + 0.05, 0, 0), (0.05, 0.12, 0.025)),
    ]
    door = [
        ((0, -hy + W, 0), (W, hy - W, 0.33)),
        ((0.07, -2 * hy + 0.1, 0), (0.05, 0.025, 0.12)),
    ]
    meta["90001"] = write_model(
        "90001", 0.5, (hx, hy, hz),
        [
            ("drawer", (0, 0, 0.25), (1, 0, 0), (0, 0.6), drawer),
            ("door", (0.4, 0.5, -0.35), (0, 0, -1), (0, 1.7), door),
        ],
        "cabinet_drawer",
    )
    # mid shelf was part of the original shell; keep geometry equivalent by
    # appending it to 90001's shell OBJ
    mdir = os.path.join(ROOT, "dataset", "90001", "textured_objs")
    shell = [
        ((0, 0, hz - W), (hx, hy, W)),
        ((0, 0, -hz + W), (hx, hy, W)),
        ((0, -hy + W, 0), (hx, W, hz)),
        ((0, hy - W, 0), (hx, W, hz)),
        ((-hx + W, 0, 0), (W, hy, hz)),
        ((0, 0, 0.0), (hx, hy, W)),
    ]
    with open(os.path.join(mdir, "original-1.obj"), "w") as f:
        f.write(multi_box_obj(shell))

    # 90002: two stacked drawers, squatter body, different raw scale
    hx, hy, hz = 0.5, 0.6, 0.8
    def drw(zc, dh):
        return [
            ((0, 0, zc), (hx - 2 * W, hy - 3 * W, dh)),
            ((hx - W, 0, zc), (W, hy - 2 * W, dh + 0.02)),
            ((hx + 0.06, 0, zc), (0.06, 0.14, 0.03)),
        ]
    meta["90002"] = write_model(
        "90002", 0.4, (hx, hy, hz),
        [
            ("drawer", (0, 0, 0.4), (1, 0, 0), (0, 0.8), drw(0, 0.3)),
            ("drawer", (0, 0, -0.4), (1, 0, 0), (0, 0.8), drw(0, 0.3)),
        ],
        "cabinet_drawer",
    )

    # 90003: double doors (left hinge +z axis at -y edge, right hinge -z at +y)
    hx, hy, hz = 0.45, 0.55, 0.75
    def door_panel(hinge_side):
        # panel extends from the hinge edge toward the centerline
        return [
            ((0, -hinge_side * (hy / 2 - W), 0), (W, hy / 2 - W, hz - 2 * W)),
            ((0.08, -hinge_side * (hy - 0.12), 0), (0.05, 0.03, 0.14)),
        ]
    meta["90003"] = write_model(
        "90003", 0.45, (hx, hy, hz),
        [
            ("door", (0.45, -0.55, 0), (0, 0, 1), (0, 1.6), door_panel(-1)),
            ("door", (0.45, 0.55, 0), (0, 0, -1), (0, 1.6), door_panel(1)),
        ],
        "cabinet_door",
    )

    with open(os.path.join(ROOT, "meta", "info_cabinet_drawer_train.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("fixture written to", ROOT)


if __name__ == "__main__":
    main()

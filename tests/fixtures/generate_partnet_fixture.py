"""Generate the committed PartNet-Mobility-schema fixture.

Produces tests/fixtures/partnet_mobility/ in the REAL dataset layout
(dataset/<id>/mobility_cvx.urdf + part OBJ meshes + meta/info_*.json) so the
real-asset ingestion path (building/articulations/partnet_mobility.py) is
exercised by tests without the downloaded dataset. Mesh units mimic raw
PartNet (unnormalized, here ~2x metric) so the meta ``scale`` is load-bearing.

Run from the repo root: python tests/fixtures/generate_partnet_fixture.py
"""
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.join(HERE, "partnet_mobility")
MODEL_ID = "90001"
SCALE = 0.5  # meta scale: raw units -> meters


def box_obj(center, half) -> str:
    cx, cy, cz = center
    hx, hy, hz = half
    v = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                v.append((cx + sx * hx, cy + sy * hy, cz + sz * hz))
    # faces (1-indexed), outward winding per axis pair
    f = [
        (1, 2, 4), (1, 4, 3),  # -x
        (5, 7, 8), (5, 8, 6),  # +x
        (1, 5, 6), (1, 6, 2),  # -y
        (3, 4, 8), (3, 8, 7),  # +y
        (1, 3, 7), (1, 7, 5),  # -z
        (2, 6, 8), (2, 8, 4),  # +z
    ]
    lines = [f"v {x:.6f} {y:.6f} {z:.6f}" for x, y, z in v]
    lines += [f"f {a} {b} {c}" for a, b, c in f]
    return "\n".join(lines) + "\n"


def multi_box_obj(boxes) -> str:
    """Several boxes in one OBJ (PartNet parts are multi-piece meshes)."""
    out, off = [], 0
    for center, half in boxes:
        piece = box_obj(center, half)
        for line in piece.splitlines():
            if line.startswith("v "):
                out.append(line)
        off += 8
    off = 0
    for center, half in boxes:
        piece = box_obj(center, half)
        for line in piece.splitlines():
            if line.startswith("f "):
                a, b, c = (int(x) + off for x in line.split()[1:])
                out.append(f"f {a} {b} {c}")
        off += 8
    return "\n".join(out) + "\n"


URDF = """<?xml version="1.0"?>
<robot name="partnet_{mid}">
  <link name="base"/>
  <link name="link_0">
    <visual name="shell">
      <origin xyz="0 0 0"/>
      <geometry><mesh filename="textured_objs/original-1.obj"/></geometry>
    </visual>
    <collision>
      <origin xyz="0 0 0"/>
      <geometry><mesh filename="textured_objs/original-1.obj"/></geometry>
    </collision>
    <inertial>
      <origin xyz="0 0 0"/>
      <mass value="8.0"/>
      <inertia ixx="0.4" iyy="0.4" izz="0.4" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="joint_0" type="fixed">
    <origin xyz="0 0 0.7"/>
    <parent link="base"/>
    <child link="link_0"/>
  </joint>
  <link name="link_1">
    <visual name="drawer">
      <origin xyz="0 0 0"/>
      <geometry><mesh filename="textured_objs/original-2.obj"/></geometry>
    </visual>
    <collision>
      <origin xyz="0 0 0"/>
      <geometry><mesh filename="textured_objs/original-2.obj"/></geometry>
    </collision>
    <inertial>
      <origin xyz="0 0 0"/>
      <mass value="2.0"/>
      <inertia ixx="0.05" iyy="0.05" izz="0.05" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="joint_1" type="prismatic">
    <origin xyz="0 0 0.25"/>
    <parent link="link_0"/>
    <child link="link_1"/>
    <axis xyz="1 0 0"/>
    <limit lower="0" upper="0.6" effort="100" velocity="1"/>
    <dynamics damping="5.0"/>
  </joint>
  <link name="link_2">
    <visual name="door">
      <origin xyz="0 0 0"/>
      <geometry><mesh filename="textured_objs/original-3.obj"/></geometry>
    </visual>
    <collision>
      <origin xyz="0 0 0"/>
      <geometry><mesh filename="textured_objs/original-3.obj"/></geometry>
    </collision>
    <inertial>
      <origin xyz="0 -0.25 0"/>
      <mass value="1.5"/>
      <inertia ixx="0.04" iyy="0.04" izz="0.04" ixy="0" ixz="0" iyz="0"/>
    </inertial>
  </link>
  <joint name="joint_2" type="revolute">
    <origin xyz="0.4 0.5 -0.35"/>
    <parent link="link_0"/>
    <child link="link_2"/>
    <axis xyz="0 0 -1"/>
    <limit lower="0" upper="1.7" effort="100" velocity="1"/>
    <dynamics damping="2.0"/>
  </joint>
</robot>
"""


def main():
    mdir = os.path.join(ROOT, "dataset", MODEL_ID, "textured_objs")
    os.makedirs(mdir, exist_ok=True)
    os.makedirs(os.path.join(ROOT, "meta"), exist_ok=True)
    W = 0.03  # wall half-thickness (raw units)
    hx, hy, hz = 0.4, 0.5, 0.7
    # shell: top/bottom/left/right/back + mid shelf (raw units, 2x metric)
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
    # drawer: body + front face + handle bar (sits in upper half)
    drawer = [
        ((0, 0, 0), (hx - 2 * W, hy - 3 * W, 0.3)),
        ((hx - W, 0, 0), (W, hy - 2 * W, 0.32)),
        ((hx + 0.05, 0, 0), (0.05, 0.12, 0.025)),
    ]
    with open(os.path.join(mdir, "original-2.obj"), "w") as f:
        f.write(multi_box_obj(drawer))
    # door: panel hinged at +y edge covering the lower half + handle
    door = [
        ((0, -hy + W, 0), (W, hy - W, 0.33)),
        ((0.07, -2 * hy + 0.1, 0), (0.05, 0.025, 0.12)),
    ]
    with open(os.path.join(mdir, "original-3.obj"), "w") as f:
        f.write(multi_box_obj(door))
    with open(os.path.join(ROOT, "dataset", MODEL_ID, "mobility_cvx.urdf"), "w") as f:
        f.write(URDF.format(mid=MODEL_ID))
    meta = {
        MODEL_ID: {
            "scale": SCALE,
            "kind": "cabinet_drawer",
            "bbox": {"min": [-hx, -hy, -hz], "max": [hx + 0.1, hy, hz]},
        }
    }
    with open(os.path.join(ROOT, "meta", "info_cabinet_drawer_train.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print("fixture written to", ROOT)


if __name__ == "__main__":
    main()

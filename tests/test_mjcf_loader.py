"""MJCF loader: collision/visual filtering + contact exclusions.

Covers the features the reference loader documents
(mani_skill/utils/building/_mjcf_loader.py:290-294 contype=0 -> no collision
shape; :287 geom group visual filter) plus <contact><exclude> body pairs,
which the reference leaves as a TODO (:863-866).
"""
import numpy as np
import pytest

from maniskill_tpu.envs.scene import ManiSkillScene

MJCF = """
<mujoco model="filter_test">
  <compiler angle="radian"/>
  <worldbody>
    <body name="base" pos="0 0 0.5">
      <freejoint/>
      <geom name="core" type="box" size="0.05 0.05 0.05"/>
      <geom name="colonly" type="sphere" size="0.04" group="3"/>
      <geom name="visonly" type="sphere" size="0.06" contype="0"
            conaffinity="0" group="2"/>
      <body name="arm" pos="0.1 0 0">
        <joint name="hinge" type="hinge" axis="0 1 0" range="-1 1"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.1 0 0"/>
      </body>
      <body name="tip" pos="0.2 0 0">
        <joint name="hinge2" type="hinge" axis="0 1 0"/>
        <geom type="sphere" size="0.02"/>
      </body>
    </body>
  </worldbody>
  <contact>
    <exclude body1="base" body2="tip"/>
    <exclude body1="base" body2="nosuchbody"/>
  </contact>
</mujoco>
"""


@pytest.fixture(scope="module")
def parsed(tmp_path_factory):
    path = tmp_path_factory.mktemp("mjcf") / "filter_test.xml"
    path.write_text(MJCF)
    scene = ManiSkillScene(num_envs=1)
    loader = scene.create_mjcf_loader()
    result = loader.parse(str(path))
    return result["articulation_builders"][0]


def _link(builder, name):
    return next(l for l in builder.links if l.name == name)


def test_contype_zero_is_visual_only(parsed):
    base = _link(parsed, "base")
    col_sizes = {round(float(np.asarray(c.size)[0]), 3) for c in base.collisions}
    vis_sizes = {round(float(np.asarray(v.size)[0]), 3) for v in base.visuals}
    assert 0.06 not in col_sizes  # contype=0 geom has no collision shape
    assert 0.06 in vis_sizes  # ... but is rendered (group 2)


def test_group3_is_collision_only(parsed):
    base = _link(parsed, "base")
    col_sizes = {round(float(np.asarray(c.size)[0]), 3) for c in base.collisions}
    vis_sizes = {round(float(np.asarray(v.size)[0]), 3) for v in base.visuals}
    assert 0.04 in col_sizes  # group=3 geom collides
    assert 0.04 not in vis_sizes  # ... but is not rendered


def test_default_group_is_both(parsed):
    base = _link(parsed, "base")
    assert any(float(np.asarray(c.size)[0]) == 0.05 for c in base.collisions)
    assert any(float(np.asarray(v.size)[0]) == 0.05 for v in base.visuals)


def test_contact_exclude_pairs(parsed):
    assert ("base", "tip") in parsed.collision_exclude_pairs
    # unknown body pair is skipped with a warning, not recorded
    assert not any("nosuchbody" in p for p in parsed.collision_exclude_pairs)

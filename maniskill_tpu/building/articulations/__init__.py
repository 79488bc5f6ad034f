"""Prebuilt articulated-asset library (counterpart of
mani_skill/utils/building/articulations/)."""
from .cabinet import (  # noqa: F401
    CABINET_VARIANTS,
    CabinetInstance,
    build_cabinet_template,
    sample_cabinet_variants,
)

"""Native asset-cooking bindings (ctypes over libcooking.so).

The reference delegates mesh cooking to SAPIEN/coacd C++ (SURVEY.md §2.1);
this module provides the TPU-native host-side equivalents: closed-mesh mass
properties, PCA OBB/capsule fitting for primitive collision substitution.
Builds lazily with g++ on first use and caches the shared object.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None


def _build() -> Path:
    # Build into a gitignored cache dir so only reviewable source is ever
    # committed; the .so is always produced locally from cooking.cpp.
    build_dir = _DIR / "build"
    build_dir.mkdir(exist_ok=True)
    so = build_dir / "libcooking.so"
    src = _DIR / "cooking.cpp"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        subprocess.check_call(
            ["g++", "-O2", "-shared", "-fPIC", "-o", str(so), str(src)]
        )
    return so


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build()))
        d = ctypes.POINTER(ctypes.c_double)
        i = ctypes.POINTER(ctypes.c_int32)
        lib.mesh_mass_properties.argtypes = [d, ctypes.c_int64, i, ctypes.c_int64, d]
        lib.mesh_mass_properties.restype = ctypes.c_int
        lib.fit_obb.argtypes = [d, ctypes.c_int64, d]
        lib.fit_obb.restype = ctypes.c_int
        lib.fit_capsule.argtypes = [d, ctypes.c_int64, d]
        lib.fit_capsule.restype = ctypes.c_int
        lib.support_points.argtypes = [d, ctypes.c_int64, d, ctypes.c_int64, i]
        lib.support_points.restype = ctypes.c_int
        _LIB = lib
    return _LIB


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def mesh_mass_properties(verts: np.ndarray, tris: np.ndarray):
    """Closed-mesh (volume, com, inertia 3x3 about COM) for unit density."""
    verts = np.ascontiguousarray(verts, np.float64)
    tris = np.ascontiguousarray(tris, np.int32)
    out = np.zeros(10, np.float64)
    rc = _lib().mesh_mass_properties(
        _dp(verts), len(verts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(tris), _dp(out),
    )
    if rc != 0:
        raise ValueError("degenerate mesh (zero volume)")
    vol, com = out[0], out[1:4]
    Ixx, Iyy, Izz, Ixy, Ixz, Iyz = out[4:10]
    I = np.array([[Ixx, -Ixy, -Ixz], [-Ixy, Iyy, -Iyz], [-Ixz, -Iyz, Izz]])
    return float(vol), com.copy(), I


def fit_obb(points: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """PCA OBB: returns (center (3,), quat wxyz (4,), half_extents (3,))."""
    pts = np.ascontiguousarray(points.reshape(-1, 3), np.float64)
    out = np.zeros(10, np.float64)
    rc = _lib().fit_obb(_dp(pts), len(pts), _dp(out))
    if rc != 0:
        raise ValueError("need >= 3 points")
    return out[0:3].copy(), out[3:7].copy(), out[7:10].copy()


def fit_capsule(points: np.ndarray):
    """PCA capsule: returns (center, quat wxyz with +z = major axis, radius,
    half_length)."""
    pts = np.ascontiguousarray(points.reshape(-1, 3), np.float64)
    out = np.zeros(10, np.float64)
    rc = _lib().fit_capsule(_dp(pts), len(pts), _dp(out))
    if rc != 0:
        raise ValueError("need >= 3 points")
    center, quat = out[0:3].copy(), out[3:7].copy()
    radius, half_len, major = float(out[7]), float(out[8]), int(out[9])
    # compose so that capsule-local +z maps onto the OBB's major axis
    if major == 0:  # +z -> +x : rotate +90 deg about y
        extra = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0])
    elif major == 1:  # +z -> +y : rotate -90 deg about x
        extra = np.array([np.cos(np.pi / 4), -np.sin(np.pi / 4), 0, 0])
    else:
        extra = np.array([1.0, 0, 0, 0])
    w1, x1, y1, z1 = quat
    w2, x2, y2, z2 = extra
    quat = np.array(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )
    return center, quat, radius, half_len


def support_points(points: np.ndarray, dirs: np.ndarray) -> np.ndarray:
    """Index of the support (max-dot) vertex for each direction: (D,) int32."""
    pts = np.ascontiguousarray(points.reshape(-1, 3), np.float64)
    dd = np.ascontiguousarray(dirs.reshape(-1, 3), np.float64)
    out = np.zeros(len(dd), np.int32)
    _lib().support_points(
        _dp(pts), len(pts), _dp(dd), len(dd),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out

"""Inertia helpers for primitive shapes (asset-pipeline, host-side numpy).

The reference delegates mass properties to SAPIEN/PhysX (density-based
auto-computation). Here primitives get analytic inertias, combined across
shapes with the parallel-axis theorem, then diagonalized to a principal frame.
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..physics.types import BOX, CAPSULE, CYLINDER, SPHERE


def primitive_mass_inertia(gtype: int, size: np.ndarray, density: float):
    """Returns (mass, inertia 3x3 about the geom's own COM in its frame)."""
    if gtype == SPHERE:
        r = size[0]
        m = density * 4.0 / 3.0 * np.pi * r**3
        i = 0.4 * m * r * r
        return m, np.diag([i, i, i])
    if gtype == BOX:
        a, b, c = size * 2.0  # full extents
        m = density * a * b * c
        return m, np.diag(
            [m / 12 * (b * b + c * c), m / 12 * (a * a + c * c), m / 12 * (a * a + b * b)]
        )
    if gtype == CAPSULE:
        r, hl = size[0], size[1]
        L = 2 * hl
        m_cyl = density * np.pi * r * r * L
        m_sph = density * 4.0 / 3.0 * np.pi * r**3
        m = m_cyl + m_sph
        # cylinder about z + two hemispheres offset
        iz = 0.5 * m_cyl * r * r + 0.4 * m_sph * r * r
        ix = (
            m_cyl * (L * L / 12 + r * r / 4)
            + m_sph * (0.4 * r * r + hl * hl + 0.75 * hl * r)
        )
        return m, np.diag([ix, ix, iz])
    if gtype == CYLINDER:
        r, hl = size[0], size[1]
        L = 2 * hl
        m = density * np.pi * r * r * L
        ix = m * (3 * r * r + L * L) / 12
        return m, np.diag([ix, ix, 0.5 * m * r * r])
    raise ValueError(f"no analytic inertia for geom type {gtype}")


def quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def mat_to_quat_np(m: np.ndarray) -> np.ndarray:
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s]
        )
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 1e-12)) * 2
    q = np.zeros(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    return q / np.linalg.norm(q)


def combine_shapes(
    shapes: List[Tuple[int, np.ndarray, np.ndarray, np.ndarray, float]],
) -> Tuple[float, np.ndarray, np.ndarray, np.ndarray]:
    """Combine (gtype, size, pos, quat, density) shapes attached to one body.

    Returns (mass, com (3,), principal inertia (3,), iquat (4,)).
    """
    total_m = 0.0
    com = np.zeros(3)
    parts = []
    for gtype, size, pos, quat, density in shapes:
        m, I = primitive_mass_inertia(gtype, np.asarray(size, float), density)
        R = quat_to_mat_np(np.asarray(quat, float))
        I_body = R @ I @ R.T  # inertia in body frame about shape COM
        parts.append((m, np.asarray(pos, float), I_body))
        total_m += m
        com += m * np.asarray(pos, float)
    if total_m <= 0:
        return 1e-3, np.zeros(3), np.full(3, 1e-7), np.array([1.0, 0, 0, 0])
    com /= total_m
    I_total = np.zeros((3, 3))
    for m, pos, I_body in parts:
        d = pos - com
        I_total += I_body + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
    evals, evecs = np.linalg.eigh(I_total)
    if np.linalg.det(evecs) < 0:
        evecs[:, 2] *= -1
    return total_m, com, np.maximum(evals, 1e-9), mat_to_quat_np(evecs)


def diagonalize_inertia(I: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Full 3x3 inertia -> (principal moments (3,), iquat wxyz)."""
    evals, evecs = np.linalg.eigh(I)
    if np.linalg.det(evecs) < 0:
        evecs[:, 2] *= -1
    return np.maximum(evals, 1e-9), mat_to_quat_np(evecs)

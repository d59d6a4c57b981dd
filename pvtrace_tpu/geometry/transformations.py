"""Homogeneous (4x4) transform math.

Functional parity with the subset of the vendored Gohlke library the
reference actually uses (``pvtrace/geometry/transformations.py``:
``translation_matrix:223``, ``rotation_matrix:303``,
``rotation_from_matrix:351``, ``euler_matrix:1061``) — implemented from
first principles (Rodrigues formula / eigen decomposition), not copied.
"""
import numpy as np


def identity_matrix():
    return np.identity(4)


def translation_matrix(direction):
    """Matrix to translate by vector `direction`."""
    m = np.identity(4)
    m[:3, 3] = direction[:3]
    return m


def translation_from_matrix(matrix):
    return np.array(matrix, copy=True)[:3, 3]


def rotation_matrix(angle, direction, point=None):
    """Matrix to rotate about axis `direction` by `angle` radians.

    When `point` is given the rotation axis passes through it.
    """
    d = np.asarray(direction[:3], dtype=float)
    d = d / np.linalg.norm(d)
    sina = np.sin(angle)
    cosa = np.cos(angle)
    # Rodrigues rotation formula
    r = cosa * np.identity(3)
    r += sina * np.array(
        [[0.0, -d[2], d[1]], [d[2], 0.0, -d[0]], [-d[1], d[0], 0.0]]
    )
    r += (1.0 - cosa) * np.outer(d, d)
    m = np.identity(4)
    m[:3, :3] = r
    if point is not None:
        point = np.asarray(point[:3], dtype=float)
        m[:3, 3] = point - r @ point
    return m


def rotation_from_matrix(matrix):
    """Recover (angle, direction, point) from a rotation matrix.

    Inverse of `rotation_matrix`.
    """
    m = np.asarray(matrix, dtype=float)
    r = m[:3, :3]
    # Axis: eigenvector of R for eigenvalue 1
    w, v = np.linalg.eig(r.T)
    i = np.where(np.abs(np.real(w) - 1.0) < 1e-8)[0]
    if len(i) == 0:
        raise ValueError("Matrix has no rotation axis (not a rotation matrix).")
    direction = np.real(v[:, i[-1]]).squeeze()
    direction = direction / np.linalg.norm(direction)
    # Point: fixed point of the full transform (eigenvector of M for unit
    # eigenvalue, normalised so the homogeneous coordinate is 1).
    w, q = np.linalg.eig(m)
    i = np.where(np.abs(np.real(w) - 1.0) < 1e-8)[0]
    if len(i) == 0:
        raise ValueError("Matrix has no unit eigenvalue.")
    point = np.real(q[:, i[-1]]).squeeze()
    point /= point[3]
    point = point[:3]
    # Angle: from trace, with sign fixed by the axis convention
    cosa = (np.trace(r) - 1.0) / 2.0
    if abs(direction[2]) > 1e-8:
        sina = (r[1, 0] + (cosa - 1.0) * direction[0] * direction[1]) / direction[2]
    elif abs(direction[1]) > 1e-8:
        sina = (r[0, 2] + (cosa - 1.0) * direction[0] * direction[2]) / direction[1]
    else:
        sina = (r[2, 1] + (cosa - 1.0) * direction[1] * direction[2]) / direction[0]
    angle = float(np.arctan2(sina, cosa))
    return angle, direction, point


def euler_matrix(ai, aj, ak, axes="sxyz"):
    """Matrix from Euler angles. Supports the static 'sxyz' convention
    (the only one the reference YAML parser exposes)."""
    if axes != "sxyz":
        raise NotImplementedError("Only the 'sxyz' convention is supported.")
    rx = rotation_matrix(ai, (1.0, 0.0, 0.0))
    ry = rotation_matrix(aj, (0.0, 1.0, 0.0))
    rz = rotation_matrix(ak, (0.0, 0.0, 1.0))
    return rz @ ry @ rx


def concatenate_matrices(*matrices):
    m = np.identity(4)
    for mat in matrices:
        m = m @ np.asarray(mat)
    return m

"""Batched rigid-transform helpers (jnp).

The device tables store rigid 4x4 local<->world matrices per node
(reference engine/compiler.py:225-233 rejects scale/shear, so vector
transforms need no inverse-transpose).
"""
import jax.numpy as jnp


def transform_point(matrix, point):
    """Apply homogeneous transform(s) to point(s).

    matrix: [..., 4, 4], point: [..., 3] -> [..., 3]
    """
    return (
        jnp.einsum("...ij,...j->...i", matrix[..., :3, :3], point)
        + matrix[..., :3, 3]
    )


def transform_vector(matrix, vector):
    """Apply the rotation part of transform(s) to vector(s)."""
    return jnp.einsum("...ij,...j->...i", matrix[..., :3, :3], vector)


def dot3(a, b):
    return jnp.sum(a * b, axis=-1)

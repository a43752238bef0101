"""Rotation primitives (pure jnp).

Behavioral parity targets in the reference:
  * euler -> matrix with PyTorch3D conventions (reference transforms.py:5-60)
  * axis rotation of point sets (reference boxes.py:20-112)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def axis_angle_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrices about a named axis for a batch of angles.

    Args:
      axis: "X", "Y" or "Z".
      angle: any-shape array of angles (radians).

    Returns:
      (..., 3, 3) rotation matrices.
    """
    cos = jnp.cos(angle)
    sin = jnp.sin(angle)
    one = jnp.ones_like(angle)
    zero = jnp.zeros_like(angle)

    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"axis must be X, Y or Z, got {axis!r}")

    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str) -> jnp.ndarray:
    """Euler angles (radians, shape (..., 3)) to rotation matrices (..., 3, 3).

    `convention` is a 3-letter string over {X, Y, Z}; the k-th letter pairs
    with the k-th euler angle and matrices compose left-to-right:
    R = R0(a0) @ R1(a1) @ R2(a2).
    """
    if euler_angles.shape[-1] != 3:
        raise ValueError("euler_angles must have a trailing dim of 3")
    if len(convention) != 3 or any(c not in "XYZ" for c in convention):
        raise ValueError(f"invalid convention {convention!r}")
    if convention[1] in (convention[0], convention[2]):
        raise ValueError(f"invalid convention {convention!r}")

    mats = [
        axis_angle_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    hi = jax.lax.Precision.HIGHEST  # 3x3 coordinate math: full f32 on TPU
    return jnp.matmul(jnp.matmul(mats[0], mats[1], precision=hi), mats[2], precision=hi)


def rotation_3d_in_axis(points: jnp.ndarray, angles: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Rotate point sets about a coordinate axis.

    Matches the MMDet3D convention used by the reference (boxes.py:20-112):
    points are row vectors multiplied by the transposed rotation matrix,
    i.e. p' = p @ R(angle).T equivalent formulation.

    Args:
      points: (N, M, 3) point sets.
      angles: (N,) rotation angles.
      axis: 0 (X), 1 (Y), or 2 (Z).

    Returns:
      (N, M, 3) rotated points.
    """
    rot_sin = jnp.sin(angles)
    rot_cos = jnp.cos(angles)
    ones = jnp.ones_like(rot_cos)
    zeros = jnp.zeros_like(rot_cos)

    if axis in (1, -2):
        rows = [
            [rot_cos, zeros, -rot_sin],
            [zeros, ones, zeros],
            [rot_sin, zeros, rot_cos],
        ]
    elif axis in (2, -1):
        rows = [
            [rot_cos, rot_sin, zeros],
            [-rot_sin, rot_cos, zeros],
            [zeros, zeros, ones],
        ]
    elif axis in (0, -3):
        rows = [
            [ones, zeros, zeros],
            [zeros, rot_cos, rot_sin],
            [zeros, -rot_sin, rot_cos],
        ]
    else:
        raise ValueError(f"axis should be in [-3, 2], got {axis}")

    # rot_mat_T[j, k, n]: same layout as the reference's stacked tensor.
    rot_mat_t = jnp.stack([jnp.stack(r, axis=0) for r in rows], axis=0)
    return jnp.einsum(
        "nmj,jkn->nmk", points, rot_mat_t, precision=jax.lax.Precision.HIGHEST
    )

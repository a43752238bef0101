"""Oriented 3D boxes as plain arrays (pure jnp).

A "general" box is a gravity-centered parametrization `xyzlhw` of shape
(..., 6) -- center (x, y, z) and dims (l, h, w) -- plus an explicit per-box
rotation matrix R of shape (..., 3, 3).  The local corner template assigns
l to the local X axis, h to local Y, and w to local Z, with the vertex
numbering of the reference (boxes.py:726-778):

            v4_____________________v5
            /|                    /|
           / |                   / |
          /__|__________________/  |
       v0|   |                  |v1|
         |   |__________________|__|
         |  / v7                |  /v6
         | /                    | /
         |/_____________________|/
         v3                     v2

X: -l/2 at {0,3,4,7}, +l/2 at {1,2,5,6}
Y: -h/2 at {0,1,4,5}, +h/2 at {2,3,6,7}
Z: -w/2 at {0,1,2,3}, +w/2 at {4,5,6,7}
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.geometry.rotation import rotation_3d_in_axis

# (8, 3) signs multiplying (l/2, h/2, w/2); row i = local corner v_i.
CORNER_SIGNS = np.array(
    [
        [-1, -1, -1],
        [+1, -1, -1],
        [+1, +1, -1],
        [-1, +1, -1],
        [-1, -1, +1],
        [+1, -1, +1],
        [+1, +1, +1],
        [-1, +1, +1],
    ],
    dtype=np.float32,
)


def box_corners(xyzlhw: jnp.ndarray, R: jnp.ndarray) -> jnp.ndarray:
    """World-frame corners of oriented boxes.

    Args:
      xyzlhw: (..., 6) center + dims (l, h, w).
      R: (..., 3, 3) rotations.

    Returns:
      (..., 8, 3) corners, vertex order as in `CORNER_SIGNS`.
    """
    center = xyzlhw[..., :3]
    half = xyzlhw[..., 3:6] * 0.5  # (l/2, h/2, w/2) on local (X, Y, Z)
    signs = jnp.asarray(CORNER_SIGNS, dtype=xyzlhw.dtype)
    local = signs * half[..., None, :]  # (..., 8, 3)
    # coordinate math: full f32 (TPU matmuls default to bf16 on the MXU,
    # which costs ~mm-scale corner error and flips IoU-gate decisions)
    world = jnp.einsum(
        "...ij,...kj->...ki", R, local, precision=jax.lax.Precision.HIGHEST
    ) + center[..., None, :]
    return world


def corners_to_params(corners: jnp.ndarray):
    """Inverse of ``box_corners``: recover (xyzlhw, R) from corners.

    Assumes this module's vertex order (CORNER_SIGNS): v0->v1 spans local X
    (length l), v0->v3 local Y (h), v0->v4 local Z (w).  Used to turn
    world-corner GT files (data_process/gt_filter.py's
    after_filter_boxes.npy layout, reference filter_gt_boxes.py:144-153)
    back into trainable box parameters.

    Args:
      corners: (..., 8, 3).

    Returns:
      (xyzlhw (..., 6), R (..., 3, 3)) with R columns = local axes.
    """
    center = corners[..., :, :].mean(-2)
    ex = corners[..., 1, :] - corners[..., 0, :]
    ey = corners[..., 3, :] - corners[..., 0, :]
    ez = corners[..., 4, :] - corners[..., 0, :]
    dims = jnp.stack(
        [jnp.linalg.norm(e, axis=-1) for e in (ex, ey, ez)], axis=-1
    )
    axes = jnp.stack(
        [e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-9)
         for e in (ex, ey, ez)],
        axis=-1,
    )  # (..., 3, 3) columns = x/y/z axes
    return jnp.concatenate([center, dims], axis=-1), axes


def boxes_to_world(xyzlhw: jnp.ndarray, R: jnp.ndarray, cam_pose: jnp.ndarray):
    """Transform camera-frame boxes into the world frame.

    Matches GeneralInstance3DBoxes.transform2world (reference boxes.py:825-833):
    center' = R_pose @ center + t_pose; R' = R_pose @ R.

    Args:
      xyzlhw: (..., 6), R: (..., 3, 3), cam_pose: (..., 4, 4) camera-to-world.

    Returns:
      (xyzlhw_world, R_world).
    """
    rp = cam_pose[..., :3, :3]
    tp = cam_pose[..., :3, 3]
    center = jnp.einsum(
        "...ij,...j->...i", rp, xyzlhw[..., :3], precision=jax.lax.Precision.HIGHEST
    ) + tp
    new_xyzlhw = jnp.concatenate([center, xyzlhw[..., 3:]], axis=-1)
    new_R = jnp.matmul(rp, R, precision=jax.lax.Precision.HIGHEST)
    return new_xyzlhw, new_R


def yaw_box_corners(boxes7: jnp.ndarray) -> jnp.ndarray:
    """Corners of bottom-centered z-up yaw boxes (x, y, z, dx, dy, dz, yaw).

    Matches DepthInstance3DBoxes.corners (reference boxes.py:524-543),
    including its unravel-index-derived corner order.

    Args:
      boxes7: (N, 7).

    Returns:
      (N, 8, 3) corners.
    """
    dims = boxes7[:, 3:6]
    # np.unravel_index(arange(8), [2,2,2]) stacked, reordered [0,1,3,2,4,5,7,6].
    norm = np.stack(np.unravel_index(np.arange(8), [2] * 3), axis=1).astype(np.float32)
    norm = norm[[0, 1, 3, 2, 4, 5, 7, 6]]
    norm = norm - np.array([0.5, 0.5, 0.0], dtype=np.float32)
    corners = dims[:, None, :] * jnp.asarray(norm)[None]
    corners = rotation_3d_in_axis(corners, boxes7[:, 6], axis=2)
    return corners + boxes7[:, None, :3]

"""Pinhole projection utilities (pure jnp).

Parity targets:
  * Instances3D.project_3d_boxes (reference instances.py:333-369): world
    corners -> per-view clamped pixel corners.
  * Instances3D.project_3d_to_2d_box (reference instances.py:670-717):
    world corners -> tight 2D xyxy with z in (0, 8) validity.
  * tools/utils.unproject (reference tools/utils.py:245-287).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def world_to_camera(points: jnp.ndarray, cam_pose: jnp.ndarray) -> jnp.ndarray:
    """Transform world points into the camera frame given camera-to-world pose.

    Args:
      points: (..., P, 3) world points.
      cam_pose: (..., 4, 4) camera-to-world.

    Returns:
      (..., P, 3) camera-frame points.
    """
    rp = cam_pose[..., :3, :3]
    tp = cam_pose[..., :3, 3]
    # inverse of [R|t] is [R^T | -R^T t]; apply R^T (p - t).  HIGHEST: TPU
    # matmuls default to bf16, far below the sub-pixel accuracy the
    # association geometry needs.
    return jnp.einsum(
        "...ji,...pj->...pi",
        rp,
        points - tp[..., None, :],
        precision=jax.lax.Precision.HIGHEST,
    )


def project_points(points_cam: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pinhole projection of camera-frame points (no clamping).

    Args:
      points_cam: (..., P, 3).
      K: (3, 3) or broadcastable (..., 3, 3).

    Returns:
      (..., P, 2) pixel coordinates (u, v).
    """
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    z = points_cam[..., 2]
    u = fx[..., None] * points_cam[..., 0] / z + cx[..., None]
    v = fy[..., None] * points_cam[..., 1] / z + cy[..., None]
    return jnp.stack([u, v], axis=-1)


def project_corners_to_image(
    corners: jnp.ndarray, cam_pose: jnp.ndarray, K: jnp.ndarray, H: int, W: int
) -> jnp.ndarray:
    """World corners -> clamped pixel corners per view.

    Matches Instances3D.project_3d_boxes: u clamped to [0, W], v to [0, H].

    Args:
      corners: (..., 8, 3) world corners.
      cam_pose: (..., 4, 4) camera-to-world per box/view.
      K: (3, 3).

    Returns:
      (..., 8, 2) clamped pixel corners.
    """
    cam = world_to_camera(corners, cam_pose)
    uv = project_points(cam, K)
    u = jnp.clip(uv[..., 0], 0.0, W)
    v = jnp.clip(uv[..., 1], 0.0, H)
    return jnp.stack([u, v], axis=-1)


def project_boxes_to_2d(
    corners: jnp.ndarray,
    K: jnp.ndarray,
    cam_pose: jnp.ndarray,
    H: int,
    W: int,
    z_max: float = 8.0,
) -> jnp.ndarray:
    """World corners -> tight xyxy 2D boxes in one view, with validity masking.

    Parity with Instances3D.project_3d_to_2d_box (instances.py:670-717): a
    corner participates when 0 < z < z_max; if a box first has no corner with
    (z>0, in-bounds uv) OR no corner passing the z-window, its 2D box is
    all-zero.  Corner uv are clipped to the image before min/max.

    Args:
      corners: (N, 8, 3) world corners.
      K: (3, 3).
      cam_pose: (4, 4) camera-to-world for the single view.
      H, W: image size.

    Returns:
      (N, 4) xyxy boxes.
    """
    cam = world_to_camera(corners, cam_pose[None])  # (N, 8, 3) via broadcast
    uv = project_points(cam, K)
    z = cam[..., 2]
    u, v = uv[..., 0], uv[..., 1]

    strict_valid = (z > 0) & (u > 0) & (u < W) & (v > 0) & (v < H)
    z_valid = (z > 0) & (z < z_max)

    u_c = jnp.clip(u, 0.0, W)
    v_c = jnp.clip(v, 0.0, H)

    big = jnp.float32(1e30)
    x1 = jnp.min(jnp.where(z_valid, u_c, big), axis=-1)
    y1 = jnp.min(jnp.where(z_valid, v_c, big), axis=-1)
    x2 = jnp.max(jnp.where(z_valid, u_c, -big), axis=-1)
    y2 = jnp.max(jnp.where(z_valid, v_c, -big), axis=-1)
    box = jnp.stack([x1, y1, x2, y2], axis=-1)

    ok = jnp.any(strict_valid, axis=-1) & jnp.any(z_valid, axis=-1)
    return jnp.where(ok[:, None], box, 0.0)


def unproject_depth(depth: jnp.ndarray, K: jnp.ndarray, RT: jnp.ndarray, max_depth: float = 10.0):
    """Backproject a depth image to world points.

    Matches tools/utils.unproject (tools/utils.py:245-287): pixel-grid (x, y)
    coordinates scaled by depth, K^-1, then RT (camera-to-world).

    Args:
      depth: (H, W).
      K: (3, 3).
      RT: (4, 4).

    Returns:
      (xyz, valid): (H, W, 3) world points and (H, W) validity.
    """
    H, W = depth.shape
    xs = jnp.arange(W, dtype=depth.dtype)
    ys = jnp.arange(H, dtype=depth.dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    uvd = jnp.stack([gx * depth, gy * depth, depth, jnp.ones_like(depth)], axis=-1)

    K4 = jnp.eye(4, dtype=depth.dtype).at[:3, :3].set(K)
    hi = jax.lax.Precision.HIGHEST
    cam = jnp.einsum("ij,hwj->hwi", jnp.linalg.inv(K4), uvd, precision=hi)
    world = jnp.einsum("ij,hwj->hwi", RT, cam, precision=hi)

    valid = depth > 0
    if max_depth is not None:
        valid &= depth < max_depth
    return world[..., :3], valid

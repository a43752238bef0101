"""Device-side dense math for spatial / correspondence association.

Capability target: the *math* inside the reference's association hot spots
(instances.py:22-125 greedy NMS IoUs, 333-369 corner projection, 670-717
global-box 2D projection).  The greedy decision loop stays on host
(fusion/manager.py); this module computes, in fused batches on TPU:

  * pairwise OBB IoU blocks between new detections and the global set
    (and new x new), with the reference's vertex-containment gate and 25^3
    grid-sampled volumetric IoU (geometry/iou.py);
  * world-corner projection into a view (clamped per-corner pixels for the
    fusion kernel, tight xyxy for the correspondence pass).

Everything is padded to static bucket sizes so jit recompiles stay bounded
as the world set grows.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.geometry.boxes import box_corners
from boxfusion_tpu.geometry.iou import obb_grid_iou
from boxfusion_tpu.geometry.projection import (
    project_boxes_to_2d,
    project_corners_to_image,
)


def _bucket(n: int, quantum: int = 32) -> int:
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


@partial(jax.jit, static_argnames=("samples",))
def _iou_block_jit(corners_a, corners_b, mask_a, mask_b, samples: int = 25):
    def row(ca, ma):
        def one(cb, mb):
            return jnp.where(ma & mb, obb_grid_iou(ca, cb, samples), 0.0)

        return jax.vmap(one)(corners_b, mask_b)

    return jax.vmap(row)(corners_a, mask_a)


def iou_block(corners_a: np.ndarray, corners_b: np.ndarray, samples: int = 25) -> np.ndarray:
    """(A, B) OBB IoU block with static-shape padding.

    Args:
      corners_a: (A, 8, 3) world corners.  corners_b: (B, 8, 3).

    Returns:
      (A, B) numpy IoU matrix (reference obb_iou semantics, instances.py:573-613).
    """
    A, B = corners_a.shape[0], corners_b.shape[0]
    if A == 0 or B == 0:
        return np.zeros((A, B), np.float32)
    pa, pb = _bucket(A), _bucket(B)
    ca = np.zeros((pa, 8, 3), np.float32)
    ca[:A] = corners_a
    cb = np.zeros((pb, 8, 3), np.float32)
    cb[:B] = corners_b
    ma = np.arange(pa) < A
    mb = np.arange(pb) < B
    out = _iou_block_jit(jnp.asarray(ca), jnp.asarray(cb), jnp.asarray(ma), jnp.asarray(mb), samples)
    return np.array(out[:A, :B])


@partial(jax.jit, static_argnames=("H", "W"))
def _project_corners_jit(corners, cam_pose, K, H, W):
    return project_corners_to_image(corners, cam_pose, K, H, W)


def project_observation_corners(
    xyzlhw: np.ndarray, R: np.ndarray, cam_pose: np.ndarray, K: np.ndarray, H: float, W: float
) -> np.ndarray:
    """World boxes -> per-box clamped 2D corner pixels (instances.py:333-369).

    Args:
      xyzlhw: (N, 6); R: (N, 3, 3); cam_pose: (N, 4, 4) per-box view.

    Returns:
      (N, 8, 2) numpy.
    """
    n = xyzlhw.shape[0]
    if n == 0:
        return np.zeros((0, 8, 2), np.float32)
    p = _bucket(n)
    t = np.zeros((p, 6), np.float32)
    t[:n] = xyzlhw
    t[n:, 3:] = 1.0
    r = np.tile(np.eye(3, dtype=np.float32), (p, 1, 1))
    r[:n] = R
    poses = np.tile(np.eye(4, dtype=np.float32), (p, 1, 1))
    poses[:n] = cam_pose
    corners = box_corners(jnp.asarray(t), jnp.asarray(r))
    out = _project_corners_jit(
        corners, jnp.asarray(poses), jnp.asarray(K), float(H), float(W)
    )
    return np.array(out[:n])


@partial(jax.jit, static_argnames=("H", "W"))
def _project_boxes2d_jit(corners, K, cam_pose, H, W):
    return project_boxes_to_2d(corners, K, cam_pose, H, W)


def project_global_boxes_2d(
    xyzlhw: np.ndarray, R: np.ndarray, K: np.ndarray, cam_pose: np.ndarray, H: float, W: float
) -> np.ndarray:
    """World boxes -> tight xyxy in one view (instances.py:670-717).

    Args:
      xyzlhw: (G, 6); R: (G, 3, 3); cam_pose: (4, 4) the current keyframe.

    Returns:
      (G, 4) numpy.
    """
    g = xyzlhw.shape[0]
    if g == 0:
        return np.zeros((0, 4), np.float32)
    p = _bucket(g)
    t = np.zeros((p, 6), np.float32)
    t[:g] = xyzlhw
    t[g:, 3:] = 1.0
    r = np.tile(np.eye(3, dtype=np.float32), (p, 1, 1))
    r[:g] = R
    corners = box_corners(jnp.asarray(t), jnp.asarray(r))
    out = _project_boxes2d_jit(
        corners, jnp.asarray(K), jnp.asarray(cam_pose), float(H), float(W)
    )
    return np.array(out[:g])

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
from boxfusion_tpu.geometry.iou import MAX_GATED_PAIRS, gated_pair_iou, obb_grid_iou
from boxfusion_tpu.geometry.projection import (
    project_boxes_to_2d,
    project_corners_to_image,
)


def _bucket(n: int, quantum: int = 32) -> int:
    return max(quantum, ((n + quantum - 1) // quantum) * quantum)


@partial(jax.jit, static_argnames=("H", "W", "samples"))
def _keyframe_geometry_jit(
    new_t, new_R, new_poses, all_t, all_R, mask_new, mask_all,
    K_depth, cur_pose, H, W, samples,
):
    """All association geometry for one keyframe in a single device call.

    Host<->device round trips dominate keyframe latency on remote-attached
    TPUs, so everything the host logic needs -- observation corner
    projections, the new-vs-all OBB IoU rows, and the global-box 2D
    projections for the correspondence pass -- is fused into one jit.

    The IoU rows are computed two-phase by the SHARED gate -> top-k ->
    pair-IoU sequence (geometry/iou.py::gated_pair_iou, one implementation
    and one budget constant for both engines): the cheap vertex-containment
    gate (the reference's check_intersection, instances.py:514-557) runs
    densely over all (new x all) pairs, then the 25^3 grid-sampled
    volumetric IoU runs only on the top MAX_GATED_PAIRS gated pairs -- the
    gate already forces IoU = 0 everywhere else in the reference's own
    semantics (instances.py:611-613).  Results come back as (pair index,
    value) lists so the host scatters into its cache (no device scatter).
    """
    new_corners3d = box_corners(new_t, new_R)
    corners2d = project_corners_to_image(new_corners3d, new_poses, K_depth, H, W)

    all_corners3d = box_corners(all_t, all_R)

    pair_idx, vals, n_gated = gated_pair_iou(
        new_corners3d, mask_new, all_corners3d, mask_all,
        MAX_GATED_PAIRS, samples,
    )

    proj2d = project_boxes_to_2d(all_corners3d, K_depth, cur_pose, H, W)
    return corners2d, pair_idx, vals, n_gated, proj2d


def keyframe_geometry(
    new_t: np.ndarray,
    new_R: np.ndarray,
    new_poses: np.ndarray,
    all_t: np.ndarray,
    all_R: np.ndarray,
    K_depth: np.ndarray,
    cur_pose: np.ndarray,
    H: float,
    W: float,
    samples: int = 25,
):
    """Padded wrapper for `_keyframe_geometry_jit`.

    Returns (corners2d (Nn, 8, 2), iou_rows (Nn, Na), proj2d_all (Na, 4)).
    """
    nn_, na = new_t.shape[0], all_t.shape[0]
    pn, pa = _bucket(nn_), _bucket(na)

    def padt(t, p):
        o = np.zeros((p, 6), np.float32)
        o[: t.shape[0]] = t
        o[t.shape[0]:, 3:] = 1.0
        return o

    def padr(r, p):
        o = np.tile(np.eye(3, dtype=np.float32), (p, 1, 1))
        o[: r.shape[0]] = r
        return o

    poses = np.tile(np.eye(4, dtype=np.float32), (pn, 1, 1))
    poses[:nn_] = new_poses
    c2d, pair_idx, vals, n_gated, proj = _keyframe_geometry_jit(
        jnp.asarray(padt(new_t, pn)),
        jnp.asarray(padr(new_R, pn)),
        jnp.asarray(poses),
        jnp.asarray(padt(all_t, pa)),
        jnp.asarray(padr(all_R, pa)),
        jnp.asarray(np.arange(pn) < nn_),
        jnp.asarray(np.arange(pa) < na),
        jnp.asarray(K_depth, jnp.float32),
        jnp.asarray(cur_pose, jnp.float32),
        float(H),
        float(W),
        samples,
    )
    if int(n_gated) > MAX_GATED_PAIRS:
        import warnings

        warnings.warn(
            f"{int(n_gated)} gated IoU pairs exceed budget {MAX_GATED_PAIRS}; "
            "excess pairs treated as IoU 0"
        )
    rows = np.zeros((pn, pa), np.float32)
    rows.reshape(-1)[np.asarray(pair_idx)] = np.asarray(vals)
    return (
        np.array(c2d[:nn_]),
        rows[:nn_, :na],
        np.array(proj[:na]),
    )


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
def _project_corners_jit(t, r, cam_pose, K, H, W):
    corners = box_corners(t, r)
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
    out = _project_corners_jit(
        jnp.asarray(t), jnp.asarray(r), jnp.asarray(poses), jnp.asarray(K), float(H), float(W)
    )
    return np.array(out[:n])


@partial(jax.jit, static_argnames=("H", "W"))
def _project_boxes2d_jit(t, r, K, cam_pose, H, W):
    corners = box_corners(t, r)
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
    out = _project_boxes2d_jit(
        jnp.asarray(t), jnp.asarray(r), jnp.asarray(K), jnp.asarray(cam_pose), float(H), float(W)
    )
    return np.array(out[:g])

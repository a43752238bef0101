"""2D box IoU and oriented-3D-box (OBB) volumetric IoU (pure jnp).

Parity targets in the reference:
  * Instances3D.IoU_2D_box (instances.py:643-668).
  * Instances3D.obb_iou (instances.py:573-613): a cheap vertex-containment
    intersection gate (check_intersection, instances.py:514-557, with edge
    midpoint augmentation) followed by a 25^3 grid-sampled volumetric IoU
    over the pair's joint AABB.

The reference computes pair IoUs lazily in a Python loop inside greedy NMS;
here the full pairwise matrix is computed in one fused pass so greedy NMS is
a simple masked scan over precomputed rows (decisions are unchanged: NMS only
consumes IoUs, never mutates boxes).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Edge list used for midpoint augmentation (reference instances.py:493-512).
_AUG_EDGES = np.array(
    [
        [0, 1], [0, 4], [1, 5], [4, 5],
        [2, 3], [2, 6], [6, 7], [3, 7],
        [0, 3], [4, 7], [1, 2], [5, 6],
    ],
    dtype=np.int32,
)

GRID_SAMPLES_PER_AXIS = 25

# Budget for `gated_pair_iou`: the single shared gate -> top-k -> pair-IoU
# sequence both engines consume (host fusion/association.py, device
# runtime/device_step.py).  One constant so the engines can never
# desynchronize on which dense scenes get truncated.
MAX_GATED_PAIRS = 1024


def iou_2d(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one xyxy box against N xyxy boxes (instances.py:643-668)."""
    ax1, ay1, ax2, ay2 = box[0], box[1], box[2], box[3]
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    ix1 = jnp.maximum(ax1, boxes[:, 0])
    iy1 = jnp.maximum(ay1, boxes[:, 1])
    ix2 = jnp.minimum(ax2, boxes[:, 2])
    iy2 = jnp.minimum(ay2, boxes[:, 3])

    iw = jnp.maximum(0.0, ix2 - ix1)
    ih = jnp.maximum(0.0, iy2 - iy1)
    inter = iw * ih
    return inter / (area_a + area_b - inter + 1e-6)


def _box_frame(corners: jnp.ndarray):
    """Recover (center, unit axes, half dims) from template-ordered corners.

    Corners must follow boxfusion_tpu.geometry.boxes.CORNER_SIGNS layout:
    v1-v0 spans local X (length l), v3-v0 local Y (h), v4-v0 local Z (w).
    """
    center = jnp.mean(corners, axis=-2)
    ex = corners[..., 1, :] - corners[..., 0, :]
    ey = corners[..., 3, :] - corners[..., 0, :]
    ez = corners[..., 4, :] - corners[..., 0, :]
    axes = jnp.stack([ex, ey, ez], axis=-2)  # (..., 3, 3) rows = axis vectors
    lens = jnp.linalg.norm(axes, axis=-1, keepdims=True)
    units = axes / jnp.maximum(lens, 1e-12)
    half = lens[..., 0] * 0.5
    return center, units, half


def _points_in_box(points, center, units, half, eps=1e-6):
    """Whether each point lies inside the oriented box (all |proj| <= half+eps)."""
    rel = points - center[..., None, :]
    # project onto the 3 unit axes: (..., P, 3).  HIGHEST precision: TPU
    # matmuls default to bf16 on the MXU, which flips corner-on-face
    # containment tests (a point exactly on a face projects past half+eps)
    # and with them every downstream NMS decision.
    proj = jnp.einsum(
        "...pj,...aj->...pa", rel, units, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.all(jnp.abs(proj) <= half[..., None, :] + eps, axis=-1)


def _augment(corners: jnp.ndarray) -> jnp.ndarray:
    """Corners + 12 edge midpoints -> (..., 20, 3) (instances.py:493-512)."""
    e = jnp.asarray(_AUG_EDGES)
    mid = 0.5 * (corners[..., e[:, 0], :] + corners[..., e[:, 1], :])
    return jnp.concatenate([corners, mid], axis=-2)


def obb_intersect_mask(corners_a: jnp.ndarray, corners_b: jnp.ndarray) -> jnp.ndarray:
    """Cheap intersection gate: any augmented vertex of one box inside the other.

    Matches check_intersection (instances.py:514-557); for rectangular boxes
    the convex-hull face planes are exactly the box's 6 faces, so the hull
    equation test reduces to an oriented point-in-box test.

    Args:
      corners_a, corners_b: (..., 8, 3).

    Returns:
      boolean (...,).
    """
    ca, ua, ha = _box_frame(corners_a)
    cb, ub, hb = _box_frame(corners_b)
    pa = _augment(corners_a)
    pb = _augment(corners_b)
    a_in_b = jnp.any(_points_in_box(pa, cb, ub, hb), axis=-1)
    b_in_a = jnp.any(_points_in_box(pb, ca, ua, ha), axis=-1)
    return a_in_b | b_in_a


def obb_grid_iou(
    corners_a: jnp.ndarray,
    corners_b: jnp.ndarray,
    samples_per_axis: int = GRID_SAMPLES_PER_AXIS,
) -> jnp.ndarray:
    """Grid-sampled volumetric IoU of two oriented boxes (instances.py:573-613).

    Samples a samples_per_axis^3 lattice over the pair's joint AABB, counts
    lattice points inside each box and in both, IoU = common / union.  Gated
    by `obb_intersect_mask` exactly as the reference (IoU = 0 when the cheap
    test fails, even if the boxes overlap slightly).

    Args:
      corners_a, corners_b: (8, 3) world corners (template layout).

    Returns:
      scalar IoU.
    """
    allc = jnp.concatenate([corners_a, corners_b], axis=0)
    lo = jnp.min(allc, axis=0)
    hi = jnp.max(allc, axis=0)

    t = jnp.linspace(0.0, 1.0, samples_per_axis, dtype=corners_a.dtype)
    xs = lo[0] + t * (hi[0] - lo[0])
    ys = lo[1] + t * (hi[1] - lo[1])
    zs = lo[2] + t * (hi[2] - lo[2])
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    pts = jnp.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)

    ca, ua, ha = _box_frame(corners_a)
    cb, ub, hb = _box_frame(corners_b)
    in_a = _points_in_box(pts, ca, ua, ha)
    in_b = _points_in_box(pts, cb, ub, hb)

    n_a = jnp.sum(in_a)
    n_b = jnp.sum(in_b)
    n_ab = jnp.sum(in_a & in_b)
    iou = n_ab / (n_a + n_b - n_ab + 1e-6)
    return jnp.where(obb_intersect_mask(corners_a, corners_b), iou, 0.0)


def obb_grid_iou_pairs(
    corners_a: jnp.ndarray,
    corners_b: jnp.ndarray,
    samples_per_axis: int = GRID_SAMPLES_PER_AXIS,
) -> jnp.ndarray:
    """Batched grid-sampled volumetric IoU over N (a, b) pairs.

    Same lattice and point-in-box math as `obb_grid_iou` (reference
    instances.py:573-613) but written as one broadcast elementwise chain —
    no meshgrid materialization, no small-K einsum — so XLA fuses the whole
    lattice into the three count reductions and only (N,) outputs touch HBM.
    The per-pair intersection gate is NOT applied here; callers that need
    the reference's gated semantics multiply by `obb_intersect_mask`.

    Args:
      corners_a, corners_b: (N, 8, 3) world corners (template layout).

    Returns:
      (N,) IoU values.
    """
    S = samples_per_axis
    allc = jnp.concatenate([corners_a, corners_b], axis=1)  # (N, 16, 3)
    lo = jnp.min(allc, axis=1)  # (N, 3)
    hi = jnp.max(allc, axis=1)

    t = jnp.linspace(0.0, 1.0, S, dtype=corners_a.dtype)
    fx = t[None, :, None, None]  # broadcast axes: (N, Sx, Sy, Sz)
    fy = t[None, None, :, None]
    fz = t[None, None, None, :]

    def coord(axis, f):
        span = (hi[:, axis] - lo[:, axis])[:, None, None, None]
        return lo[:, axis][:, None, None, None] + f * span

    px = coord(0, fx)
    py = coord(1, fy)
    pz = coord(2, fz)

    def in_box(corners):
        c, u, h = _box_frame(corners)
        rx = px - c[:, 0][:, None, None, None]
        ry = py - c[:, 1][:, None, None, None]
        rz = pz - c[:, 2][:, None, None, None]
        ins = None
        for j in range(3):
            pj = (
                rx * u[:, j, 0][:, None, None, None]
                + ry * u[:, j, 1][:, None, None, None]
                + rz * u[:, j, 2][:, None, None, None]
            )
            ok = jnp.abs(pj) <= (h[:, j] + 1e-6)[:, None, None, None]
            ins = ok if ins is None else ins & ok
        return ins

    in_a = in_box(corners_a)
    in_b = in_box(corners_b)
    n_a = jnp.sum(in_a, axis=(1, 2, 3))
    n_b = jnp.sum(in_b, axis=(1, 2, 3))
    n_ab = jnp.sum(in_a & in_b, axis=(1, 2, 3))
    return n_ab / (n_a + n_b - n_ab + 1e-6)


def gated_pair_iou(
    corners_q: jnp.ndarray,
    mask_q: jnp.ndarray,
    corners_all: jnp.ndarray,
    mask_all: jnp.ndarray,
    max_pairs: int = MAX_GATED_PAIRS,
    samples_per_axis: int = GRID_SAMPLES_PER_AXIS,
):
    """(Q x A) gated pairwise OBB IoU under a fixed pair budget.

    The ONE implementation of the reference's obb_iou call-site semantics
    (instances.py:573-613: containment gate forces IoU = 0, grid IoU
    otherwise) shared by the host engine (fusion/association.py) and the
    device engine (runtime/device_step.py): the cheap vertex-containment
    gate runs densely over all (Q x A) pairs, then the 25^3 lattice IoU runs
    only on the first `max_pairs` gated pairs (row-major order via top_k on
    the 0/1 gate).  Gated pairs beyond the budget are scored 0 -- callers
    surface `n_gated - k` as a truncation counter instead of silently
    weakening NMS.

    Args:
      corners_q: (Q, 8, 3) query world corners; mask_q: (Q,) validity.
      corners_all: (A, 8, 3); mask_all: (A,).

    Returns:
      (pair_idx (k,) flat row-major indices into Q*A, vals (k,) IoUs,
      n_gated scalar int32 count of pairs that passed the gate).
    """
    A = corners_all.shape[0]
    gate = jax.vmap(
        lambda ca, ma: jax.vmap(lambda cb, mb: ma & mb & obb_intersect_mask(ca, cb))(
            corners_all, mask_all
        )
    )(corners_q, mask_q)

    flat = gate.reshape(-1)
    k = min(max_pairs, flat.shape[0])
    n_gated = jnp.sum(flat.astype(jnp.int32))
    _, pair_idx = jax.lax.top_k(flat.astype(jnp.int32), k)
    ia = pair_idx // A
    ib = pair_idx % A

    # one fused elementwise lattice over all selected pairs
    # (obb_grid_iou_pairs): only the (k,) IoUs touch HBM, vs ~1 GB/keyframe
    # of materialized (k, 25^3, 3) intermediates per-pair.
    vals = jnp.where(
        flat[pair_idx],
        obb_grid_iou_pairs(corners_q[ia], corners_all[ib], samples_per_axis),
        0.0,
    )
    return pair_idx, vals, n_gated


def pairwise_obb_iou(
    corners: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    samples_per_axis: int = GRID_SAMPLES_PER_AXIS,
    row_chunk: int = 8,
) -> jnp.ndarray:
    """Full (N, N) OBB IoU matrix.

    Computed row-chunked with lax.map to bound the live sample tensor
    ((chunk, N, S^3) booleans) while letting XLA fuse the point tests.
    Invalid rows/cols (per `valid`) and the diagonal get IoU 0.

    Args:
      corners: (N, 8, 3).
      valid: optional (N,) mask.

    Returns:
      (N, N) IoU matrix (symmetric up to sampling).
    """
    n = corners.shape[0]

    def one_row(ca):
        return jax.vmap(lambda cb: obb_grid_iou(ca, cb, samples_per_axis))(corners)

    pad = (-n) % row_chunk
    padded = jnp.concatenate([corners, jnp.zeros((pad, 8, 3), corners.dtype)], axis=0) if pad else corners
    chunks = padded.reshape(-1, row_chunk, 8, 3)
    mat = jax.lax.map(jax.vmap(one_row), chunks).reshape(-1, n)[:n]

    mat = mat * (1.0 - jnp.eye(n, dtype=mat.dtype))
    if valid is not None:
        v = valid.astype(mat.dtype)
        mat = mat * v[:, None] * v[None, :]
    return mat

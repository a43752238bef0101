"""Multi-view projected-box IoU fitness -- the reference's CUDA kernel, TPU-style.

Capability target: the inline CUDA kernel ``compute_iou_value`` (reference
boxfusion/box_fusion.py:63-407).  Per (particle, view) cell the reference:

  1. perturbs the candidate box with ``PST[node] * search_size``
     (box_fusion.py:296-307, dims clamped >= 0.01);
  2. builds 8 corners from the (l, h, w) template, rotates by the fixed box
     rotation, translates (310-331);
  3. projects into the view with the camera pose + pinhole K, clamping uv to
     the image rectangle (347-360);
  4. takes the 2D convex hull of the projected points and of the observed
     box corners (monotone chain with device `new`/`delete`, 95-145);
  5. intersects the two convex polygons (point-in-polygon + segment
     intersections + angular sort, 159-261) and evaluates shoelace areas
     (148-156) for the projected IoU;
  6. accumulates |1 - IoU| per particle, averaged over views (400-401, 454).

TPU-first re-derivation (no heap, no data-dependent shapes, no sequential
hull stacks): convex hulls are extracted with an *all-pairs half-plane test*
-- a pair (i, j) of points is a hull edge iff every point lies on one side of
the line through it (28 pairs x 8 points, fully vectorized) -- and the
intersection is a masked Sutherland-Hodgman clip of the ordered hull of A by
the (unordered) half-planes of hull(B).  All polygons live in fixed-size
padded vertex arrays; everything vmaps over the (particles x views) grid and
fuses into one XLA computation, so the whole 20-iteration optimization runs
device-resident (vs. the reference's per-iteration host->device re-upload,
box_fusion.py:432-452).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.geometry.boxes import CORNER_SIGNS

_EPS = 1e-9
MAX_VERTS = 20  # 8 subject vertices + <= 8 distinct clip planes, with margin

# All 28 unordered index pairs of 8 points.
_PAIR_I, _PAIR_J = np.triu_indices(8, k=1)


def _hull_halfplanes(pts: jnp.ndarray):
    """Half-planes of the convex hull of 8 points.

    Args:
      pts: (8, 2).

    Returns:
      normals (28, 2), offsets (28,), valid (28,) such that a point x is
      inside the hull iff for every valid plane: n.x + d >= -eps.
    """
    pi = pts[_PAIR_I]  # (28, 2)
    pj = pts[_PAIR_J]
    e = pj - pi
    n = jnp.stack([-e[:, 1], e[:, 0]], axis=-1)  # left normal of i->j
    # signed side of every point w.r.t. each candidate line, computed from
    # point *differences* (cross(e, p - pi)) to avoid the catastrophic
    # cancellation of expanding n.p - n.pi at image-scale coordinates.
    rel = pts[None, :, :] - pi[:, None, :]  # (28, 8, 2)
    s = e[:, None, 0] * rel[..., 1] - e[:, None, 1] * rel[..., 0]  # (28, 8)
    # tolerance scales with the magnitude of the products forming s.
    mag = jnp.max(jnp.abs(rel), axis=(1, 2)) * jnp.max(jnp.abs(e), axis=-1)  # (28,)
    tol = (2e-5 * mag + 1e-9)[:, None]
    all_nonneg = jnp.all(s >= -tol, axis=-1)
    all_nonpos = jnp.all(s <= tol, axis=-1)
    nondegenerate = jnp.sum(e * e, axis=-1) > _EPS
    valid = nondegenerate & (all_nonneg | all_nonpos)
    sign = jnp.where(all_nonneg, 1.0, -1.0)[:, None]
    n = n * sign
    d = -jnp.sum(n * pi, axis=-1)
    return n, d, valid


def _ordered_hull(pts: jnp.ndarray) -> jnp.ndarray:
    """Hull vertices of 8 points in CCW-or-CW angular order, padded to 8.

    Non-hull points are replaced by the first hull vertex (harmless repeats:
    zero-length edges contribute nothing to areas or clips).
    """
    pi = pts[_PAIR_I]
    e = pts[_PAIR_J] - pi
    rel = pts[None, :, :] - pi[:, None, :]
    s = e[:, None, 0] * rel[..., 1] - e[:, None, 1] * rel[..., 0]
    mag = jnp.max(jnp.abs(rel), axis=(1, 2)) * jnp.max(jnp.abs(e), axis=-1)
    tol = (2e-5 * mag + 1e-9)[:, None]
    _, _, valid = _hull_halfplanes(pts)
    # a point is a hull vertex iff it lies on some valid hull edge line
    on_edge = (jnp.abs(s) <= tol) & valid[:, None]
    is_vertex = jnp.any(on_edge, axis=0)  # (8,)
    # if the set is fully degenerate (no valid edges), keep all points
    is_vertex = jnp.where(jnp.any(valid), is_vertex, jnp.ones_like(is_vertex))

    first = jnp.argmax(is_vertex)
    anchor = pts[first]
    filled = jnp.where(is_vertex[:, None], pts, anchor[None])

    center = jnp.sum(jnp.where(is_vertex[:, None], pts, 0.0), axis=0) / jnp.maximum(
        jnp.sum(is_vertex), 1
    )
    ang = jnp.arctan2(filled[:, 1] - center[1], filled[:, 0] - center[0])
    order = jnp.argsort(ang)
    return filled[order]


def _shoelace(poly: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """|area| of the first `count` vertices of a padded polygon (V, 2)."""
    V = poly.shape[0]
    idx = jnp.arange(V)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    cur = poly
    nxtv = poly[nxt]
    terms = cur[:, 0] * nxtv[:, 1] - nxtv[:, 0] * cur[:, 1]
    terms = jnp.where(idx < count, terms, 0.0)
    return jnp.abs(jnp.sum(terms)) / 2.0


def _clip_halfplane(poly, count, n, d, plane_valid):
    """One Sutherland-Hodgman step: clip padded polygon by n.x + d >= 0."""
    V = poly.shape[0]
    idx = jnp.arange(V)
    nxt_idx = jnp.where(idx + 1 >= count, 0, idx + 1)
    cur = poly
    nxt = poly[nxt_idx]

    s_cur = jnp.sum(cur * n, axis=-1) + d
    s_nxt = jnp.sum(nxt * n, axis=-1) + d
    in_cur = s_cur >= -_EPS
    in_nxt = s_nxt >= -_EPS

    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    inter = cur + t[:, None] * (nxt - cur)

    active = idx < count
    emit_cur = in_cur & active
    emit_inter = (in_cur != in_nxt) & active

    counts = emit_cur.astype(jnp.int32) + emit_inter.astype(jnp.int32)
    offs = jnp.cumsum(counts) - counts  # start offset per input edge

    out = jnp.zeros_like(poly)
    pos_cur = jnp.where(emit_cur, offs, V)  # V = out of bounds -> dropped
    out = out.at[pos_cur].set(cur, mode="drop")
    pos_int = jnp.where(emit_inter, offs + emit_cur.astype(jnp.int32), V)
    out = out.at[pos_int].set(inter, mode="drop")
    new_count = jnp.sum(counts)

    keep = jnp.logical_not(plane_valid)
    return (
        jnp.where(keep, poly, out),
        jnp.where(keep, count, new_count),
    )


def convex_polygon_iou(pts_a: jnp.ndarray, pts_b: jnp.ndarray) -> jnp.ndarray:
    """IoU of the convex hulls of two 8-point sets (one cell of the kernel).

    Matches the CUDA hull/clip/shoelace pipeline (box_fusion.py:364-398).

    Args:
      pts_a, pts_b: (8, 2).

    Returns:
      scalar IoU in [0, 1].
    """
    # center both point sets jointly: areas/IoU are translation-invariant and
    # small coordinates keep every float32 cross product well-conditioned.
    center = 0.5 * (jnp.mean(pts_a, axis=0) + jnp.mean(pts_b, axis=0))
    pts_a = pts_a - center
    pts_b = pts_b - center

    hull_a = _ordered_hull(pts_a)  # (8, 2) ordered, padded with repeats
    hull_b = _ordered_hull(pts_b)

    area_a = _shoelace(hull_a, jnp.int32(8))
    area_b = _shoelace(hull_b, jnp.int32(8))

    poly = jnp.zeros((MAX_VERTS, 2), pts_a.dtype).at[:8].set(hull_a)
    count = jnp.int32(8)

    n, d, valid = _hull_halfplanes(pts_b)

    def body(p, plane):
        poly, count = p
        nn, dd, vv = plane
        return _clip_halfplane(poly, count, nn, dd, vv), None

    (poly, count), _ = jax.lax.scan(body, (poly, count), (n, d, valid))
    inter = _shoelace(poly, count)
    # convex intersection can never exceed either hull; clamp float noise.
    inter = jnp.minimum(inter, jnp.minimum(area_a, area_b))

    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / (union + 1e-5), 0.0)


def perturb_candidates(xyzlhw: jnp.ndarray, pst: jnp.ndarray, search_size: jnp.ndarray):
    """Candidate boxes: params + PST * search_size (box_fusion.py:296-307).

    Args:
      xyzlhw: (6,) current box (x, y, z, l, h, w).
      pst: (P, 6) particle table; row 0 is the identity particle.
      search_size: (6,) per-dof scales, slots (x, y, z, l, w, h)?  No --
        slots follow the reference: [0:3] center xyz, [3] l, [4] h, [5] w
        (the CUDA kernel adds pst[3]*ss[3] to l, pst[4]*ss[4] to h,
        pst[5]*ss[5] to w, box_fusion.py:299-301).

    Returns:
      (P, 6) perturbed boxes with dims clamped >= 0.01.
    """
    cand = xyzlhw[None] + pst * search_size[None]
    dims = jnp.maximum(cand[:, 3:], 0.01)
    return jnp.concatenate([cand[:, :3], dims], axis=-1)


def multiview_fitness(
    xyzlhw: jnp.ndarray,
    R: jnp.ndarray,
    pst: jnp.ndarray,
    search_size: jnp.ndarray,
    cam_poses: jnp.ndarray,
    obs_corners: jnp.ndarray,
    view_mask: jnp.ndarray,
    K: jnp.ndarray,
    H: jnp.ndarray,
    W: jnp.ndarray,
) -> jnp.ndarray:
    """Fitness of every PST particle: mean over views of |1 - projected IoU|.

    Equivalent to one ``evaluate_iou`` call of the reference
    (box_fusion.py:413-461) but with all (particle x view) cells evaluated in
    one fused XLA computation and masked views instead of a dynamic count.

    Args:
      xyzlhw: (6,), R: (3, 3) fixed rotation of the candidate box.
      pst: (P, 6).  search_size: (6,).
      cam_poses: (V, 4, 4) camera-to-world per member view.
      obs_corners: (V, 8, 2) observed projected 2D corners per view.
      view_mask: (V,) validity of each view slot.
      K: (3, 3); H, W: image bounds for uv clamping.

    Returns:
      (P,) fitness values (lower is better).
    """
    cand = perturb_candidates(xyzlhw, pst, search_size)  # (P, 6)

    # corners: template order l->X, h->Y, w->Z (box_fusion.py:310-319),
    # identical to geometry.boxes.CORNER_SIGNS.
    signs = jnp.asarray(CORNER_SIGNS, cand.dtype)  # (8, 3)
    half = cand[:, 3:] * 0.5  # (P, 3) = (l, h, w)/2
    local = signs[None] * half[:, None, :]  # (P, 8, 3)
    corners = jnp.einsum("ij,pkj->pki", R, local) + cand[:, None, :3]  # (P, 8, 3)

    # project into every view: world -> cam via pose^-1 (box_fusion.py:347-354).
    rot = cam_poses[:, :3, :3]  # (V, 3, 3)
    t = cam_poses[:, :3, 3]  # (V, 3)
    rel = corners[None] - t[:, None, None]  # (V, P, 8, 3)
    cam = jnp.einsum("vji,vpkj->vpki", rot, rel)
    u = K[0, 0] * cam[..., 0] / cam[..., 2] + K[0, 2]
    v = K[1, 1] * cam[..., 1] / cam[..., 2] + K[1, 2]
    u = jnp.clip(u, 0.0, W)
    v = jnp.clip(v, 0.0, H)
    uv = jnp.stack([u, v], axis=-1)  # (V, P, 8, 2)

    Vn, P = uv.shape[0], uv.shape[1]
    flat_a = uv.reshape(Vn * P, 8, 2)
    flat_b = jnp.broadcast_to(obs_corners[:, None], (Vn, P, 8, 2)).reshape(Vn * P, 8, 2)
    iou = jax.vmap(convex_polygon_iou)(flat_a, flat_b).reshape(Vn, P)

    err = jnp.abs(1.0 - iou) * view_mask[:, None]
    return jnp.sum(err, axis=0) / (jnp.sum(view_mask) + 1e-6)

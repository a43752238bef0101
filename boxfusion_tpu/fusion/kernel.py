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


def _pair_sides(pts: jnp.ndarray):
    """Per candidate edge (all 28 point pairs): signed sides + tolerance.

    The single source of the side-sign geometry shared by
    ``_hull_halfplanes`` and ``_ordered_hull`` -- the edge/vertex
    classifications MUST use identical arithmetic and tolerance or the two
    desynchronize on boundary-degenerate hulls.

    Returns (pi (28,2), e (28,2), s (28,8), tol (28,1)).
    """
    pi = pts[_PAIR_I]  # (28, 2)
    e = pts[_PAIR_J] - pi
    # signed side of every point w.r.t. each candidate line, computed from
    # point *differences* (cross(e, p - pi)) to avoid the catastrophic
    # cancellation of expanding n.p - n.pi at image-scale coordinates.
    rel = pts[None, :, :] - pi[:, None, :]  # (28, 8, 2)
    s = e[:, None, 0] * rel[..., 1] - e[:, None, 1] * rel[..., 0]  # (28, 8)
    # tolerance scales with the magnitude of the products forming s.
    mag = jnp.max(jnp.abs(rel), axis=(1, 2)) * jnp.max(jnp.abs(e), axis=-1)  # (28,)
    tol = (2e-5 * mag + 1e-9)[:, None]
    return pi, e, s, tol


def _hull_halfplanes(pts: jnp.ndarray):
    """Half-planes of the convex hull of 8 points.

    Args:
      pts: (8, 2).

    Returns:
      normals (28, 2), offsets (28,), valid (28,) such that a point x is
      inside the hull iff for every valid plane: n.x + d >= -eps.
    """
    pi, e, s, tol = _pair_sides(pts)
    n = jnp.stack([-e[:, 1], e[:, 0]], axis=-1)  # left normal of i->j
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
    _, _, s, tol = _pair_sides(pts)  # identical arithmetic by construction
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


def _signed_area_ccw(hull: jnp.ndarray) -> jnp.ndarray:
    """Signed shoelace sum (positive for CCW) over an 8-vertex closed hull."""
    nxt = jnp.roll(hull, -1, axis=0)
    return jnp.sum(hull[:, 0] * nxt[:, 1] - nxt[:, 0] * hull[:, 1]) / 2.0


def _clipped_boundary_integral(hull: jnp.ndarray, planes, tol_sign: float) -> jnp.ndarray:
    """Green's-theorem line integral of one polygon's edges clipped to the
    other polygon's half-planes.

    Each CCW edge p->q of `hull` intersects a convex region in a single
    parameter interval [t0, t1] (Liang-Barsky against every half-plane);
    the segment p(t0)->p(t1) contributes cross(p(t0), p(t1)) to the closed
    boundary integral (= 2x area when both polygons' contributions are
    summed).  `tol_sign` breaks ties on shared collinear boundaries: +1
    (inclusive) for the first polygon, -1 (exclusive) for the second, so a
    shared edge is counted exactly once.

    Pure min/max reductions: no sort, no scatter (TPU-safe).
    """
    n, d, valid = planes
    p = hull
    e = jnp.roll(hull, -1, axis=0) - hull  # (8, 2)

    hi = jax.lax.Precision.HIGHEST  # clip geometry: bf16 MXU flips edge tests
    sp = jnp.matmul(p, n.T, precision=hi) + d[None]  # (8, 28) signed distance at edge start
    se = jnp.matmul(e, n.T, precision=hi)  # (8, 28) change along edge
    sq = sp + se

    tol = (2e-5 * jnp.max(jnp.abs(sp), axis=0, keepdims=True) + 1e-9) * (-tol_sign)

    inside_p = sp >= tol
    inside_q = sq >= tol
    denom = jnp.where(jnp.abs(se) < _EPS, _EPS, -se)  # sp - sq = -se
    t_star = (sp - tol) / denom

    entering = (~inside_p) & inside_q & valid[None]
    exiting = inside_p & (~inside_q) & valid[None]
    both_out = (~inside_p) & (~inside_q) & valid[None]

    t0 = jnp.max(jnp.where(entering, t_star, 0.0), axis=1)
    t1 = jnp.min(jnp.where(exiting, t_star, 1.0), axis=1)
    empty = jnp.any(both_out, axis=1) | (t0 >= t1)

    a = p + t0[:, None] * e
    b = p + t1[:, None] * e
    contrib = a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1]
    return jnp.sum(jnp.where(empty, 0.0, contrib))


def prepare_polygon(pts: jnp.ndarray):
    """Hull + half-planes + area of one 8-point set (reusable across pairs).

    Args:
      pts: (8, 2), pre-centered by the caller.

    Returns:
      (hull (8, 2) CCW, planes (n, d, valid), area scalar).
    """
    hull = _ordered_hull(pts)
    area = jnp.abs(_signed_area_ccw(hull))
    planes = _hull_halfplanes(pts)
    return hull, planes, area


def prepared_polygon_iou(prep_a, prep_b) -> jnp.ndarray:
    """IoU of two `prepare_polygon` outputs (Green's-theorem integral)."""
    hull_a, planes_a, area_a = prep_a
    hull_b, planes_b, area_b = prep_b
    inter2 = _clipped_boundary_integral(hull_a, planes_b, +1.0) + _clipped_boundary_integral(
        hull_b, planes_a, -1.0
    )
    inter = jnp.maximum(inter2 / 2.0, 0.0)
    # convex intersection can never exceed either hull; clamp float noise.
    inter = jnp.minimum(inter, jnp.minimum(area_a, area_b))
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / (union + 1e-5), 0.0)


def convex_polygon_iou(pts_a: jnp.ndarray, pts_b: jnp.ndarray) -> jnp.ndarray:
    """IoU of the convex hulls of two 8-point sets (one cell of the kernel).

    Functional equivalent of the CUDA hull / polygon-intersection / shoelace
    pipeline (box_fusion.py:95-261, 364-398), re-derived for TPU: the
    intersection *area* is computed directly as a Green's-theorem boundary
    integral over each hull's edges clipped against the other hull's
    half-planes -- fixed shapes, no heap, no sort, no scatter.

    Args:
      pts_a, pts_b: (8, 2).

    Returns:
      scalar IoU in [0, 1].
    """
    # center both point sets jointly: areas/IoU are translation-invariant and
    # small coordinates keep every float32 cross product well-conditioned.
    center = 0.5 * (jnp.mean(pts_a, axis=0) + jnp.mean(pts_b, axis=0))
    return prepared_polygon_iou(
        prepare_polygon(pts_a - center), prepare_polygon(pts_b - center)
    )


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
    impl: str = "auto",
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
    corners = jnp.einsum(
        "ij,pkj->pki", R, local, precision=jax.lax.Precision.HIGHEST
    ) + cand[:, None, :3]  # (P, 8, 3)

    # project into every view: world -> cam via pose^-1 (box_fusion.py:347-354).
    rot = cam_poses[:, :3, :3]  # (V, 3, 3)
    t = cam_poses[:, :3, 3]  # (V, 3)
    rel = corners[None] - t[:, None, None]  # (V, P, 8, 3)
    cam = jnp.einsum(
        "vji,vpkj->vpki", rot, rel, precision=jax.lax.Precision.HIGHEST
    )
    # guard z ~ 0 (e.g. padded view slots) against NaN; clamping bounds the
    # result exactly like the reference's uv clamp (box_fusion.py:359-360).
    z = cam[..., 2]
    z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = K[0, 0] * cam[..., 0] / z + K[0, 2]
    v = K[1, 1] * cam[..., 1] / z + K[1, 2]
    u = jnp.clip(u, 0.0, W)
    v = jnp.clip(v, 0.0, H)
    uv = jnp.stack([u, v], axis=-1)  # (V, P, 8, 2)

    Vn, P = uv.shape[0], uv.shape[1]

    if impl == "auto":
        impl = (
            "pallas"
            if (jax.default_backend() == "tpu" and P % 128 == 0)
            else "xla"
        )

    if impl == "pallas":
        # VMEM-resident kernel path (ops/fitness_kernel.py): one grid cell
        # per view, particles tiled (P/128, 128).
        from boxfusion_tpu.ops.fitness_kernel import (
            fitness_cells_pallas,
            prepare_observed,
        )

        prep = prepare_observed(obs_corners)
        uv_c = uv - prep["center"][:, None, None]
        pt = P // 128
        u = uv_c[..., 0].transpose(0, 2, 1).reshape(Vn, 8, pt, 128)
        v_ = uv_c[..., 1].transpose(0, 2, 1).reshape(Vn, 8, pt, 128)
        err = fitness_cells_pallas(
            u,
            v_,
            prep["hull"],
            prep["planes"],
            prep["pvalid"],
            prep["area"][:, None],
            view_mask[:, None].astype(jnp.float32),
        )  # (V, pt, 128), already view-masked
        return jnp.sum(err.reshape(Vn, P), axis=0) / (jnp.sum(view_mask) + 1e-6)

    # XLA path: the observed polygon is shared by all particles of a view:
    # prepare its hull/half-planes once per view, not per (particle, view).
    center_v = jnp.mean(obs_corners, axis=1)  # (V, 2)
    prep_b = jax.vmap(prepare_polygon)(obs_corners - center_v[:, None])

    uv_c = uv - center_v[:, None, None]
    prep_a = jax.vmap(jax.vmap(prepare_polygon))(uv_c)  # over (V, P)
    iou = jax.vmap(
        lambda pa, pb: jax.vmap(lambda pa_one: prepared_polygon_iou(pa_one, pb))(pa)
    )(prep_a, prep_b)  # (V, P)

    # where-mask (not multiply) so NaNs from padded view slots cannot leak.
    err = jnp.where(view_mask[:, None] > 0, jnp.abs(1.0 - iou), 0.0)
    return jnp.sum(err, axis=0) / (jnp.sum(view_mask) + 1e-6)

"""Tests for the fusion subsystem: projected-IoU kernel, PST optimizer,
manager bookkeeping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxfusion_tpu.fusion import (
    BoxManager,
    PSTOptConfig,
    convex_polygon_iou,
    init_opt_params,
    iou_block,
    multiview_fitness,
    nms_3d,
    optimize_boxes,
    synthesize_pst,
)
from boxfusion_tpu.geometry.boxes import box_corners
from boxfusion_tpu.geometry.projection import project_corners_to_image
from boxfusion_tpu.utils.config import load_config


def _mc_hull_iou(pts_a, pts_b, n=200_000, seed=0):
    """Monte-Carlo IoU of convex hulls via scipy Delaunay membership."""
    from scipy.spatial import ConvexHull, Delaunay

    rng = np.random.RandomState(seed)
    try:
        ha, hb = ConvexHull(pts_a), ConvexHull(pts_b)
    except Exception:
        return 0.0
    allp = np.concatenate([pts_a, pts_b], 0)
    lo, hi = allp.min(0), allp.max(0)
    samples = rng.uniform(lo, hi, size=(n, 2))
    da = Delaunay(pts_a[ha.vertices])
    db = Delaunay(pts_b[hb.vertices])
    in_a = da.find_simplex(samples) >= 0
    in_b = db.find_simplex(samples) >= 0
    inter = (in_a & in_b).mean()
    union = (in_a | in_b).mean()
    return float(inter / union) if union > 0 else 0.0


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_polygon_iou_vs_monte_carlo(seed):
    rng = np.random.RandomState(seed)
    a = rng.uniform(0, 100, size=(8, 2)).astype(np.float32)
    b = (rng.uniform(0, 100, size=(8, 2)) + rng.uniform(-30, 30, 2)).astype(np.float32)
    got = float(convex_polygon_iou(jnp.asarray(a), jnp.asarray(b)))
    want = _mc_hull_iou(a, b)
    assert abs(got - want) < 0.02, (got, want)


def test_polygon_iou_identical_and_disjoint():
    sq = np.array(
        [[0, 0], [10, 0], [10, 10], [0, 10], [5, 5], [5, 0], [0, 5], [10, 5]],
        np.float32,
    )
    assert float(convex_polygon_iou(jnp.asarray(sq), jnp.asarray(sq))) == pytest.approx(1.0, abs=1e-5)
    far = sq + np.array([100.0, 0.0], np.float32)
    assert float(convex_polygon_iou(jnp.asarray(sq), jnp.asarray(far))) == pytest.approx(0.0, abs=1e-6)
    # half overlap: [5,15]x[0,10] vs [0,10]x[0,10] -> inter 50, union 150
    shifted = sq + np.array([5.0, 0.0], np.float32)
    assert float(convex_polygon_iou(jnp.asarray(sq), jnp.asarray(shifted))) == pytest.approx(
        50.0 / 150.0, abs=1e-3
    )


def test_polygon_iou_image_scale_regression():
    # Near-axis-aligned projected boxes at image-scale coordinates: float32
    # cancellation collapsed the hull here before the differenced side test.
    a = np.array(
        [[290.84, 216.72], [203.74, 216.72], [203.2, 186.4], [291.2, 186.4],
         [284.17, 206.23], [213.75, 206.23], [213.4, 181.69], [284.4, 181.69]],
        np.float32,
    )
    b = np.array(
        [[288.35, 216.11], [223.65, 216.11], [223.18, 172.94], [288.82, 172.94],
         [283.45, 207.91], [228.55, 207.91], [228.21, 171.26], [283.79, 171.26]],
        np.float32,
    )
    got = float(jax.jit(convex_polygon_iou)(jnp.asarray(a), jnp.asarray(b)))
    want = _mc_hull_iou(a, b)
    assert abs(got - want) < 0.02, (got, want)
    assert float(jax.jit(convex_polygon_iou)(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(
        1.0, abs=1e-4
    )


def test_polygon_iou_degenerate_points():
    # all 8 points identical (a box fully clamped to one border pixel)
    pt = np.tile(np.array([[3.0, 4.0]], np.float32), (8, 1))
    sq = np.array(
        [[0, 0], [10, 0], [10, 10], [0, 10], [0, 0], [10, 0], [10, 10], [0, 10]],
        np.float32,
    )
    v = float(convex_polygon_iou(jnp.asarray(pt), jnp.asarray(sq)))
    assert v == pytest.approx(0.0, abs=1e-6)
    assert np.isfinite(v)


def _make_views(n_views, gt_xyzlhw, K, H, W, seed=0):
    """Cameras on a ring looking at the box center; observed corners are the
    projections of the GT box."""
    rng = np.random.RandomState(seed)
    center = gt_xyzlhw[:3]
    poses = []
    for i in range(n_views):
        ang = 2 * np.pi * i / max(n_views, 1) * 0.25
        eye = center + np.array([3.0 * np.sin(ang), 0.3, -3.0 * np.cos(ang)])
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, -1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R = np.stack([right, upv, fwd], axis=1)  # columns: cam axes in world
        P = np.eye(4, dtype=np.float32)
        P[:3, :3] = R
        P[:3, 3] = eye
        poses.append(P)
    poses = np.stack(poses).astype(np.float32)

    corners = box_corners(jnp.asarray(gt_xyzlhw[None]), jnp.eye(3)[None])[0]
    obs = project_corners_to_image(
        jnp.broadcast_to(corners[None], (n_views, 8, 3)),
        jnp.asarray(poses),
        jnp.asarray(K),
        H,
        W,
    )
    return poses, np.asarray(obs)


def test_fitness_identity_particle_zero_for_gt():
    gt = np.array([0.0, 0.0, 0.0, 0.6, 0.4, 0.5], np.float32)
    K = np.array([[300.0, 0, 256], [0, 300.0, 192], [0, 0, 1]], np.float32)
    H, W = 384.0, 512.0
    poses, obs = _make_views(3, gt, K, H, W)
    pst = synthesize_pst(64)
    fit = multiview_fitness(
        jnp.asarray(gt),
        jnp.eye(3),
        jnp.asarray(pst),
        jnp.asarray(np.full(6, 0.1, np.float32)),
        jnp.asarray(poses),
        jnp.asarray(obs),
        jnp.ones(3),
        jnp.asarray(K),
        jnp.float32(H),
        jnp.float32(W),
    )
    fit = np.asarray(fit)
    # particle 0 is identity -> IoU 1 in every view -> fitness 0
    assert fit[0] == pytest.approx(0.0, abs=1e-4)
    assert np.all(fit[1:] >= -1e-6)
    assert fit[1:].mean() > 0.01  # perturbed particles are worse


def test_optimizer_recovers_perturbed_box():
    gt = np.array([0.2, -0.1, 0.3, 0.6, 0.4, 0.5], np.float32)
    K = np.array([[300.0, 0, 256], [0, 300.0, 192], [0, 0, 1]], np.float32)
    H, W = 384.0, 512.0
    poses, obs = _make_views(4, gt, K, H, W)

    start = gt + np.array([0.06, -0.05, 0.04, 0.15, -0.1, 0.12], np.float32)
    pst = synthesize_pst(256)
    fused, updated = optimize_boxes(
        jnp.asarray(start[None]),
        jnp.eye(3)[None],
        jnp.asarray(pst),
        jnp.asarray(poses[None]),
        jnp.asarray(obs[None]),
        jnp.ones((1, 4)),
        jnp.ones(1, bool),
        jnp.asarray(K),
        jnp.float32(H),
        jnp.float32(W),
        PSTOptConfig(iters=20),
    )
    fused = np.asarray(fused[0])
    assert bool(updated[0])
    err0 = np.abs(start - gt).sum()
    err1 = np.abs(fused - gt).sum()
    assert err1 < 0.5 * err0, (err0, err1, fused)


def test_optimizer_inactive_slot_untouched():
    gt = np.array([0.0, 0.0, 0.0, 0.6, 0.4, 0.5], np.float32)
    K = np.array([[300.0, 0, 256], [0, 300.0, 192], [0, 0, 1]], np.float32)
    poses, obs = _make_views(3, gt, K, 384.0, 512.0)
    pst = synthesize_pst(64)
    fused, updated = optimize_boxes(
        jnp.asarray(gt[None]),
        jnp.eye(3)[None],
        jnp.asarray(pst),
        jnp.asarray(poses[None]),
        jnp.asarray(obs[None]),
        jnp.ones((1, 3)),
        jnp.zeros(1, bool),  # inactive
        jnp.asarray(K),
        jnp.float32(384.0),
        jnp.float32(512.0),
        PSTOptConfig(iters=3),
    )
    assert not bool(updated[0])
    np.testing.assert_allclose(np.asarray(fused[0]), gt, atol=1e-6)


def test_init_opt_params_axis_matching():
    # best box has dims sorted as (l=0.2, h=0.6, w=0.4): axis order by size is
    # l smallest, w middle, h largest
    box3d = np.array(
        [
            [0.0, 0.0, 0.0, 0.2, 0.6, 0.4],
            [1.0, 1.0, 1.0, 0.3, 0.5, 0.1],
        ],
        np.float32,
    )
    R = np.tile(np.eye(3, dtype=np.float32), (2, 1, 1))
    scores = np.array([0.9, 0.1], np.float32)
    xyzlhw, rot = init_opt_params(
        jnp.asarray(box3d), jnp.asarray(R), jnp.asarray(scores), jnp.ones(2)
    )
    xyzlhw = np.asarray(xyzlhw)
    np.testing.assert_allclose(xyzlhw[:3], [0.5, 0.5, 0.5], atol=1e-6)
    # per reference: sort each box's dims ascending then permute into the
    # best box's axis-rank order; mean of (0.2,0.6,0.4) and (0.1,0.5,0.3)
    np.testing.assert_allclose(xyzlhw[3:], [0.15, 0.55, 0.35], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rot), np.eye(3), atol=1e-6)


def test_nms_3d_greedy_matches_reference_semantics():
    cfg = load_config("config/ca1m.yaml")
    bm = BoxManager(cfg)
    # 3 boxes: 0 and 1 overlap heavily, 2 is disjoint; scores order 0 > 2 > 1
    scores = np.array([0.9, 0.4, 0.6])
    iou = np.zeros((3, 3))
    iou[0, 1] = iou[1, 0] = 0.5
    init_id = np.array([0, 1, 2])
    poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    poses[1, :3, 3] = [2.0, 0.0, 0.0]  # far baseline -> record allowed
    sizes = np.full((3, 3), 0.2, np.float32)
    centers = np.zeros((3, 3), np.float32)
    valid_num = np.zeros(3)

    bm.init_new_predictions(3, 0)
    keep, success = nms_3d(
        valid_num, bm, iou, scores, init_id, poses, sizes, centers, iou_threshold=0.1
    )
    np.testing.assert_array_equal(keep, [0, 2])
    np.testing.assert_array_equal(success, [0])
    assert valid_num[0] == 1
    assert bm.fusion_list[0] == [0, 1]  # observation 1 recorded into box 0


def test_iou_block_matches_single():
    rng = np.random.RandomState(0)
    t = rng.uniform(-1, 1, (3, 6)).astype(np.float32)
    t[:, 3:] = rng.uniform(0.3, 0.8, (3, 3))
    corners = np.asarray(box_corners(jnp.asarray(t), jnp.tile(jnp.eye(3), (3, 1, 1))))
    m = iou_block(corners, corners)
    assert m.shape == (3, 3)
    # diagonal is IoU of a box with itself (the reference gate passes): ~1
    assert np.all(np.diag(m) > 0.95)
    assert np.allclose(m, m.T, atol=0.05)

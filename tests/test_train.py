"""Tests for the training stack and mesh shardings."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxfusion_tpu.train.loss import detection_loss, greedy_match


def test_greedy_match_simple():
    cost = jnp.array([[0.0, 5.0], [5.0, 0.0], [2.0, 2.0]])  # (Q=3, G=2)
    a = greedy_match(cost, jnp.ones(2, bool))
    np.testing.assert_array_equal(np.asarray(a), [0, 1])


def test_greedy_match_no_double_assign():
    # query 0 is cheapest for both GTs; second GT must take the next best
    cost = jnp.array([[0.0, 0.1], [1.0, 0.5], [2.0, 2.0]])
    a = greedy_match(cost, jnp.ones(2, bool))
    assert a[0] == 0 and a[1] == 1


def test_detection_loss_finite_and_improves_with_match():
    rng = np.random.RandomState(0)
    Q, G = 20, 3
    pred = dict(
        logits=jnp.asarray(rng.randn(Q, 2), jnp.float32),
        boxes=jnp.asarray(rng.uniform(0, 256, (Q, 4)), jnp.float32),
        proj_xy=jnp.asarray(rng.uniform(0, 256, (Q, 2)), jnp.float32),
        z_scaled=jnp.asarray(rng.uniform(0.5, 3, (Q, 1)), jnp.float32),
        dims=jnp.asarray(rng.uniform(0.1, 1, (Q, 3)), jnp.float32),
        pose=jnp.tile(jnp.eye(3)[None], (Q, 1, 1)),
    )
    tgt = dict(
        boxes2d=pred["boxes"][:G],
        proj_xy=pred["proj_xy"][:G],
        z=pred["z_scaled"][:G],
        dims=pred["dims"][:G],
        pose=pred["pose"][:G],
        mask=jnp.ones(G),
    )
    out = jax.jit(lambda p, t: detection_loss(p, t, 256.0))(pred, tgt)
    assert np.isfinite(float(out["total"]))
    # regression terms should be ~0 since targets equal some predictions
    assert float(out["box2d"]) < 1e-5
    assert float(out["dims"]) < 1e-5


def test_train_step_reduces_loss():
    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.train.step import init_train_state, make_train_step
    from __graft_entry__ import _example_batch

    model = make_cutr(dimension=192, depth_model=True)
    batch = _example_batch(S=256, r=4, B=1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    rng = np.random.RandomState(1)
    G = 4
    targets = dict(
        boxes2d=jnp.asarray(rng.uniform(50, 200, (1, G, 4)), jnp.float32),
        proj_xy=jnp.asarray(rng.uniform(0, 256, (1, G, 2)), jnp.float32),
        z=jnp.asarray(rng.uniform(0.5, 4.0, (1, G, 1)), jnp.float32),
        dims=jnp.asarray(rng.uniform(0.1, 1.0, (1, G, 3)), jnp.float32),
        pose=jnp.tile(jnp.eye(3)[None, None], (1, G, 1, 1)),
        mask=jnp.ones((1, G)),
    )
    train_step, tx = make_train_step(model, learning_rate=1e-4)
    state = init_train_state(params, tx)
    step = jax.jit(train_step)
    state, m0 = step(state, batch, targets)
    for _ in range(4):
        state, m = step(state, batch, targets)
    assert float(m["loss"]) < float(m0["loss"]), (float(m0["loss"]), float(m["loss"]))


def test_mesh_shardings_divisibility():
    from boxfusion_tpu.parallel.mesh import make_mesh, param_shardings

    mesh = make_mesh(8)
    assert dict(mesh.shape) == {"dp": 2, "fsdp": 2, "tp": 2}
    # odd-shaped kernels must not be sharded on axes they don't divide
    params = {"a": {"kernel": jnp.zeros((255, 256))}, "b": {"kernel": jnp.zeros((256, 512))}}
    sh = param_shardings(params, mesh)
    assert sh["a"]["kernel"].spec == jax.sharding.PartitionSpec(None, "tp")
    assert sh["b"]["kernel"].spec == jax.sharding.PartitionSpec("fsdp", "tp")


def test_shard_inference_matches_single_device():
    """Model-parallel CuTR forward on the 8-device mesh == single device.

    GSPMD may reorder reductions, so compare with a small tolerance.
    """
    from boxfusion_tpu.models.cutr import FrameBatch, make_cutr
    from boxfusion_tpu.parallel import make_mesh, shard_inference

    S, r, dim = 256, 4, 192
    rng = np.random.RandomState(0)
    f = 0.6 * S
    batch = FrameBatch(
        image=jnp.asarray(rng.randn(1, S, S, 3), jnp.float32),
        depth=jnp.asarray(rng.randn(1, S // r, S // r, 1), jnp.float32),
        K=jnp.asarray([[[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]]], jnp.float32),
        image_hw=jnp.asarray([[0.75 * S, S]], jnp.float32),
        depth_params=jnp.asarray([[2.0, 0.5]], jnp.float32),
        T_gravity=jnp.eye(3, dtype=jnp.float32)[None],
    )
    model = make_cutr(dimension=dim, depth_model=True)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    want = jax.jit(model.apply)(params, batch)

    mesh = make_mesh(8)
    jitted, placed = shard_inference(model.apply, mesh, params)
    got = jitted(placed, batch)

    # parameters really are distributed
    n_sharded = sum(
        0 if v.sharding.spec == jax.sharding.PartitionSpec() else 1
        for v in jax.tree.leaves(placed)
        if hasattr(v, "sharding")
    )
    assert n_sharded > 20, n_sharded

    # dense (pre-top-k) outputs are order-free; top-k row ORDER can differ
    # because sharded reductions reorder float sums among near-tied scores
    np.testing.assert_allclose(
        np.asarray(got["enc_logits"]), np.asarray(want["enc_logits"]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(got["enc_boxes"]), np.asarray(want["enc_boxes"]), atol=0.5
    )
    np.testing.assert_allclose(
        np.sort(np.asarray(got["scores"]).ravel()),
        np.sort(np.asarray(want["scores"]).ravel()),
        atol=2e-3,
    )


def test_training_targets_match_head_layout():
    """The loss supervises the RAW head outputs: dims in (w, h, l) order
    (exported boxes3d is LHW only after model.py's (2,1,0) reorder) and
    pose PRE-gravity (inference exports T_gravity @ pose_head).  Regression
    for a silent supervision mismatch: with swapped targets the loss still
    converges but a converged model exports swapped l/w and doubly-rotated
    poses."""
    from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
    from boxfusion_tpu.train.__main__ import (
        _frame_targets,
        _targets_from_world_corners,
    )

    seq = SyntheticSequence(n_frames=2, n_boxes=4, seed=3)
    frame = next(iter(seq))
    det = OracleDetector(seq, noise=0.0)(frame)
    t = _frame_targets(seq, frame, G=8)
    n = int(t["mask"].sum())
    assert n > 0
    lhw = det["boxes3d"][:n, 3:]
    np.testing.assert_allclose(t["dims"][:n], lhw[:, (2, 1, 0)], atol=1e-6)

    # real-GT path: fabricate a tilted T_gravity and a box straight ahead;
    # the export relation T_gravity @ pose_target must recover the
    # camera-frame GT rotation
    from boxfusion_tpu.geometry.boxes import box_corners

    c, s = np.cos(0.3), np.sin(0.3)
    Tg = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    R_gt = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)  # 90° yaw
    xyzlhw = np.array([[0.0, 0.0, 2.0, 0.8, 0.5, 0.3]], np.float32)
    corners_cam = np.asarray(box_corners(xyzlhw, R_gt[None]))

    class _F:
        gt_pose = np.eye(4, dtype=np.float32)  # camera at world origin
        K = np.array([[200.0, 0, 128], [0, 200.0, 96], [0, 0, 1]], np.float32)
        T_gravity = Tg
        image = np.zeros((192, 256, 3), np.uint8)

    t2 = _targets_from_world_corners(corners_cam, _F(), G=4)
    assert int(t2["mask"].sum()) == 1
    # dims: corners_to_params returns (l, h, w); target must be (w, h, l)
    np.testing.assert_allclose(
        np.sort(t2["dims"][0]), np.sort(xyzlhw[0, 3:]), atol=1e-5
    )
    np.testing.assert_allclose(t2["dims"][0][1], xyzlhw[0, 4], atol=1e-5)
    # pose: export relation recovers the camera-frame rotation (up to the
    # box-frame axis permutation corners_to_params may choose)
    R_export = Tg @ t2["pose"][0]
    col_match = np.abs(R_export.T @ R_gt)
    np.testing.assert_allclose(col_match.max(0), 1.0, atol=1e-4)
    np.testing.assert_allclose(col_match.max(1), 1.0, atol=1e-4)

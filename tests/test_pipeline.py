"""Integration tests: the online pipeline on a deterministic synthetic scene.

This is the closed-form end-to-end test the reference lacks (SURVEY.md
section 4): known world boxes + known camera ring -> association and fusion
outcomes are predictable.
"""
import numpy as np
import pytest

from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
from boxfusion_tpu.runtime import OnlinePipeline
from boxfusion_tpu.utils.config import load_config


def _match_gt(world_xyzlhw, gt_xyzlhw):
    """Greedy center matching; returns per-gt best center distance."""
    d = np.linalg.norm(
        world_xyzlhw[:, None, :3] - gt_xyzlhw[None, :, :3], axis=-1
    )
    return d.min(axis=0)


def _small_caps(c):
    """Small static capacities so CPU CI runs fast (TPU defaults are larger)."""
    c["data"]._data["gap"] = 5
    c["detection"]._data["uv_bound"] = False
    c["detection"]._data["floor_mask"] = False
    c["box_fusion"]._data["pst_path"] = None
    c["box_fusion"]._data["pst_size"] = 128
    c["box_fusion"]._data["iters"] = 8
    c["box_fusion"]._data["max_fusions_per_frame"] = 4
    c["association"]._data["max_views"] = 5
    return c


@pytest.fixture(scope="module")
def cfg():
    c = _small_caps(load_config("config/ca1m.yaml"))
    c["detection"]._data["score_thresh"] = 0.3
    return c


def test_iter_with_last():
    from boxfusion_tpu.runtime.stream import iter_with_last

    assert list(iter_with_last([])) == []
    assert list(iter_with_last([7])) == [(7, True)]
    assert list(iter_with_last(iter("abc"))) == [
        ("a", False), ("b", False), ("c", True)
    ]


def test_last_frame_is_keyframe(cfg):
    """demo.py:200: the final frame always detects/associates, even when its
    index is not a gap multiple -- on 8 frames at gap 3 the keyframes are
    {0, 3, 6, 7}; on 7 frames (last index IS a multiple) they are {0, 3, 6}
    with no double-processing."""
    for n_frames, expect in ((8, [0, 3, 6, 7]), (7, [0, 3, 6])):
        seq = SyntheticSequence(n_frames=n_frames, n_boxes=3, seed=0)
        pipe = OnlinePipeline(cfg, OracleDetector(seq, noise=0.0))
        seen = []
        orig = pipe.process_keyframe

        def spy(frame, _orig=orig, _pipe=pipe, _seen=seen):
            _seen.append(_pipe.count)
            return _orig(frame)

        pipe.process_keyframe = spy
        pipe.run(seq, gap=3)
        assert seen == expect, (n_frames, seen)


def test_pipeline_oracle_noiseless(cfg):
    seq = SyntheticSequence(n_frames=30, n_boxes=5, seed=0)
    det = OracleDetector(seq, noise=0.0)
    pipe = OnlinePipeline(cfg, det)
    world = pipe.run(seq, gap=5)

    # every GT box should be represented exactly once (NMS dedupes the
    # re-detections across keyframes)
    assert len(world) == seq.n_boxes, (len(world), seq.n_boxes)
    dists = _match_gt(world.arrays["xyzlhw"], seq.gt_xyzlhw)
    assert np.all(dists < 0.05), dists


def test_pipeline_oracle_noisy_fusion_improves(cfg):
    seq = SyntheticSequence(n_frames=40, n_boxes=4, seed=1)
    det = OracleDetector(seq, noise=0.04, seed=2)
    pipe = OnlinePipeline(cfg, det)
    world = pipe.run(seq, gap=5)

    assert len(world) >= seq.n_boxes  # noise may split an object occasionally
    dists = _match_gt(world.arrays["xyzlhw"], seq.gt_xyzlhw)
    assert np.all(dists < 0.15), dists
    # at least one object should have been multi-view fused
    assert any(f == 1 for f in pipe.manager.fusion_flag)


def test_pipeline_fusion_off(cfg):
    c = _small_caps(load_config("config/ca1m.yaml"))
    c["box_fusion"]._data["use"] = False
    seq = SyntheticSequence(n_frames=20, n_boxes=3, seed=3)
    pipe = OnlinePipeline(c, OracleDetector(seq))
    world = pipe.run(seq, gap=5)
    assert len(world) == 3
    assert not any(pipe.manager.fusion_flag)


def test_pipeline_save_outputs(cfg, tmp_path):
    from boxfusion_tpu.utils.io import load_data, save_world_boxes

    seq = SyntheticSequence(n_frames=15, n_boxes=3, seed=4)
    pipe = OnlinePipeline(cfg, OracleDetector(seq))
    world = pipe.run(seq, gap=5)
    path = save_world_boxes(world, ["object"], str(tmp_path), "synthetic")
    data = load_data(path)
    assert len(data) == 1 and len(data[0]) == len(world)
    cls, corners, feat = data[0][0]
    assert corners.shape == (8, 3)


def test_pipeline_frame_and_keyframe_hooks(cfg):
    """run() fires on_frame per frame and on_keyframe per keyframe (the
    reference's live rerun logging cadence, demo.py:174-197,330)."""
    seq = SyntheticSequence(n_frames=15, n_boxes=3, seed=4)
    pipe = OnlinePipeline(cfg, OracleDetector(seq))
    frames, keyframes = [], []
    pipe.run(
        seq,
        gap=5,
        on_frame=lambda f: frames.append(f),
        on_keyframe=lambda w: keyframes.append(len(w)),
    )
    assert len(frames) == 15
    # 0, 5, 10 + the always-keyframe final frame 14 (demo.py:200)
    assert len(keyframes) == 4
    assert keyframes[-1] == 3


def test_cutr_detector_fused_matches_two_step():
    """CuTRDetector's single-dispatch path == Preprocessor + model.apply.

    The fused executable (pixel normalize + pad + whiten + forward + squeeze
    in one jit) must be numerically identical to the two-step path it
    replaced, and device_output must hand back jax arrays (no D2H).
    """
    import jax
    import jax.numpy as jnp

    from boxfusion_tpu.data.preprocess import Preprocessor
    from boxfusion_tpu.data.readers import Frame
    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.runtime.detector import CuTRDetector

    rng = np.random.RandomState(0)
    H, W = 192, 256
    image = rng.randint(0, 255, (H, W, 3), np.uint8)
    depth = (rng.rand(H, W) * 3.0 + 0.3).astype(np.float32)
    K = np.array([[210.0, 0, W / 2], [0, 210.0, H / 2], [0, 0, 1]], np.float32)
    frame = Frame(
        image=image, depth=depth, K=K, K_depth=K,
        T_gravity=np.eye(3, dtype=np.float32),
        gt_pose=np.eye(4, dtype=np.float32),
        video_id="t", timestamp=0,
    )

    model = make_cutr(dimension=192, depth_model=True)
    pre = Preprocessor()
    batch, square, ratio = pre(image, depth, K, frame.T_gravity)
    assert (square, ratio) == (256, 1)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    want = jax.jit(model.apply)(params, batch)

    det = CuTRDetector(model, params, device_output=True, export_image=True)
    got = det(frame)
    assert all(isinstance(v, jax.Array) for v in got.values())
    # same math, but fused vs two-step are different XLA programs; allow
    # last-ulp rounding drift from different fusion choices
    for k in ("scores", "pred_boxes", "boxes3d", "R", "proj_xy"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k][0]), rtol=1e-6, atol=1e-4, err_msg=k
        )

    # image_dev round-trips the u8 pixels inside the actual (h, w) region
    img = np.asarray(got["image_dev"])[:H, :W]
    np.testing.assert_allclose(img, image.astype(np.float32), atol=1e-3)

    # numpy path never exports the image (export_image requires device_output)
    det_np = CuTRDetector(model, params, export_image=True)
    got_np = det_np(frame)
    assert "image_dev" not in got_np
    np.testing.assert_allclose(
        got_np["scores"], np.asarray(want["scores"][0]), rtol=1e-6, atol=1e-5
    )

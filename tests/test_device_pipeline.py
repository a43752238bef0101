"""Device-resident pipeline: correctness + parity vs the host pipeline."""
import numpy as np
import pytest

from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
from boxfusion_tpu.runtime import OnlinePipeline
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
from boxfusion_tpu.utils.config import load_config


def _cfg():
    c = load_config("config/ca1m.yaml")
    c["data"]._data["gap"] = 5
    c["detection"]._data["score_thresh"] = 0.3
    c["detection"]._data["uv_bound"] = False
    c["detection"]._data["floor_mask"] = False
    c["detection"]._data["max_detections"] = 16
    c["box_fusion"]._data["pst_path"] = None
    c["box_fusion"]._data["pst_size"] = 128
    c["box_fusion"]._data["iters"] = 8
    c["box_fusion"]._data["max_fusions_per_frame"] = 4
    c["association"]._data["max_views"] = 5
    return c


@pytest.fixture(scope="module")
def noiseless_worlds():
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=30, n_boxes=5, seed=0)
    host = OnlinePipeline(cfg, OracleDetector(seq, noise=0.0))
    host_world = host.run(seq, gap=5)
    dev = DevicePipeline(cfg, OracleDetector(seq, noise=0.0), capacity=64)
    dev_world = dev.run(seq, gap=5)
    return seq, host, host_world, dev, dev_world


def test_device_matches_gt(noiseless_worlds):
    seq, _, _, _, dev_world = noiseless_worlds
    assert len(dev_world["scores"]) == seq.n_boxes
    d = np.linalg.norm(
        dev_world["xyzlhw"][:, None, :3] - seq.gt_xyzlhw[None, :, :3], axis=-1
    ).min(axis=0)
    assert np.all(d < 0.05), d


def test_device_matches_host_pipeline(noiseless_worlds):
    seq, host, host_world, dev, dev_world = noiseless_worlds
    assert len(dev_world["scores"]) == len(host_world)
    # same objects (match by init_id -- the greedy decisions must align)
    np.testing.assert_array_equal(
        np.sort(dev_world["init_id"]), np.sort(host_world.arrays["init_id"])
    )
    order_d = np.argsort(dev_world["init_id"])
    order_h = np.argsort(host_world.arrays["init_id"])
    np.testing.assert_allclose(
        dev_world["xyzlhw"][order_d],
        host_world.arrays["xyzlhw"][order_h],
        atol=5e-3,
    )
    # fusion lists identical
    fl_d = [dev_world["fusion_list"][i] for i in order_d]
    fl_h = [host.manager.fusion_list[i] for i in order_h]
    assert fl_d == fl_h


def test_device_noisy_runs_and_fuses():
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=40, n_boxes=4, seed=1)
    dev = DevicePipeline(cfg, OracleDetector(seq, noise=0.04, seed=2), capacity=64)
    world = dev.run(seq, gap=5)
    assert len(world["scores"]) >= seq.n_boxes
    assert world["fusion_flag"].any()
    d = np.linalg.norm(
        world["xyzlhw"][:, None, :3] - seq.gt_xyzlhw[None, :, :3], axis=-1
    ).min(axis=0)
    assert np.all(d < 0.15), d


def test_device_with_labeler():
    from boxfusion_tpu.models.clip.head import OpenVocabLabeler
    from boxfusion_tpu.models.clip.model import CLIPConfig

    cfg = _cfg()
    tiny = CLIPConfig(
        patch=32, width=64, layers=2, heads=2, embed_dim=32,
        vocab_size=64, context_length=8, text_width=64, text_layers=1, text_heads=2,
    )
    tf = np.random.RandomState(0).randn(4, 32).astype(np.float32)
    labeler = OpenVocabLabeler(
        ["chair", "table", "sofa", "lamp"], tf, cfg=tiny, sim_thres=-1e9, max_boxes=16
    ).init_random()

    seq = SyntheticSequence(n_frames=15, n_boxes=3, seed=5)
    dev = DevicePipeline(cfg, OracleDetector(seq), labeler=labeler, capacity=64)
    world = dev.run(seq, gap=5)
    assert len(world["scores"]) == 3
    assert all(c in ("chair", "table", "sofa", "lamp") for c in world["categories"])


def test_device_empty_keyframes():
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=10, n_boxes=3, seed=2)

    class EmptyDetector:
        def __call__(self, frame):
            return dict(
                scores=np.zeros(0, np.float32),
                pred_boxes=np.zeros((0, 4), np.float32),
                boxes3d=np.zeros((0, 6), np.float32),
                R=np.zeros((0, 3, 3), np.float32),
                proj_xy=np.zeros((0, 2), np.float32),
            )

    dev = DevicePipeline(cfg, EmptyDetector(), capacity=64)
    world = dev.run(seq, gap=5)
    assert len(world["scores"]) == 0


def test_device_resident_detections_match_numpy_path():
    """Detector outputs that are jax arrays take the no-D2H fast path
    (keyframe_step_devdet) and must produce the same world as host packing."""
    import jax.numpy as jnp

    cfg = _cfg()
    seq = SyntheticSequence(n_frames=30, n_boxes=5, seed=0)
    oracle = OracleDetector(seq, noise=0.0)

    class DeviceOracle:
        def __call__(self, frame):
            det = {k: jnp.asarray(v) for k, v in oracle(frame).items()}
            # append junk rows beyond max_detections (=16) to exercise the
            # fast path's trace-time truncation: extras must be dropped
            pad = 20 - det["scores"].shape[0]
            det = {
                k: jnp.concatenate(
                    [v, jnp.zeros((pad,) + v.shape[1:], v.dtype)], 0
                )
                for k, v in det.items()
            }
            det["scores"] = det["scores"].at[-pad:].set(-1e9)
            return det

    ref = DevicePipeline(cfg, oracle, capacity=64)
    ref_world = ref.run(seq, gap=5)
    dev = DevicePipeline(cfg, DeviceOracle(), capacity=64)
    dev_world = dev.run(seq, gap=5)

    np.testing.assert_array_equal(
        np.sort(dev_world["init_id"]), np.sort(ref_world["init_id"])
    )
    od = np.argsort(dev_world["init_id"])
    oh = np.argsort(ref_world["init_id"])
    np.testing.assert_allclose(
        dev_world["xyzlhw"][od], ref_world["xyzlhw"][oh], atol=1e-5
    )


def test_world_capacity_overflow_drops_not_corrupts():
    """When the world buffer fills, excess detections are dropped; existing
    rows must stay intact (dynamic_update_slice would have clamped the write
    offset and overwritten live rows)."""
    import jax.numpy as jnp

    from boxfusion_tpu.runtime.device_state import init_state
    from boxfusion_tpu.runtime.device_step import (
        StepConfig,
        keyframe_step_devdet,
        META_WIDTH,
    )

    cap, kmax = 8, 6
    state = init_state(capacity=cap, max_views=5, obs_capacity=16)
    cfg = StepConfig(
        score_thresh=0.1, fusion_use=False, nms_threshold=0.1,
        uv_bound=False, floor_mask=False,
    )
    pst = jnp.zeros((128, 6), jnp.float32)

    meta = np.zeros(META_WIDTH, np.float32)
    meta[:16] = np.eye(4).ravel()
    K = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]], np.float32)
    meta[16:25] = K.ravel()
    meta[25:34] = K.ravel()
    meta[34:36] = (128.0, 128.0)

    def det_at(xoff):
        # 6 well-separated boxes in front of the camera (no NMS suppression)
        centers = np.stack(
            [np.linspace(-5, 5, 6) + xoff, np.zeros(6), np.full(6, 3.0)], 1
        )
        return dict(
            scores=jnp.asarray(np.linspace(0.9, 0.5, 6), jnp.float32),
            pred_boxes=jnp.asarray(np.tile([10, 10, 30, 30.0], (6, 1)), jnp.float32),
            boxes3d=jnp.asarray(
                np.concatenate([centers, np.full((6, 3), 0.4)], 1), jnp.float32
            ),
            R=jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (6, 1, 1))),
            proj_xy=jnp.zeros((6, 2), jnp.float32),
            category=jnp.zeros(6, jnp.int32),
        )

    meta0 = meta.copy()
    state = keyframe_step_devdet(state, det_at(0.0), jnp.asarray(meta0), pst, cfg, kmax)
    first = np.asarray(state.xyzlhw[: int(state.n)]).copy()
    assert int(state.n) == 6

    # far-away second keyframe: 6 more boxes, but only 2 slots remain
    meta1 = meta.copy()
    meta1[36] = 1.0
    state = keyframe_step_devdet(state, det_at(100.0), jnp.asarray(meta1), pst, cfg, kmax)
    assert int(state.n) == cap  # clamped, not wrapped
    np.testing.assert_allclose(np.asarray(state.xyzlhw[:6]), first, atol=1e-5)


def test_device_check_valid_drops_unreobserved():
    """box_fusion.check_valid on the device engine: a box never re-observed
    within one keyframe gap is dropped (box_manager.py:151-166)."""
    import jax.numpy as jnp

    from boxfusion_tpu.runtime.device_state import init_state
    from boxfusion_tpu.runtime.device_step import (
        META_WIDTH,
        StepConfig,
        keyframe_step_devdet,
    )

    gap = 5
    cfg = StepConfig(
        score_thresh=0.1, fusion_use=False, uv_bound=False, floor_mask=False,
        check_valid=True, gap=gap,
    )
    state = init_state(capacity=16, max_views=5, obs_capacity=64)
    pst = jnp.zeros((128, 6), jnp.float32)
    K = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]], np.float32)

    def meta_at(frame_idx):
        m = np.zeros(META_WIDTH, np.float32)
        m[:16] = np.eye(4).ravel()
        m[16:25] = K.ravel()
        m[25:34] = K.ravel()
        m[34:36] = (128.0, 128.0)
        m[36] = frame_idx
        return jnp.asarray(m)

    def det(centers):
        n = len(centers)
        return dict(
            scores=jnp.full((n,), 0.8, jnp.float32),
            pred_boxes=jnp.asarray(np.tile([10, 10, 30, 30.0], (n, 1)), jnp.float32),
            boxes3d=jnp.asarray(
                np.concatenate([np.asarray(centers, np.float32),
                                np.full((n, 3), 0.4, np.float32)], 1)
            ),
            R=jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (n, 1, 1))),
            proj_xy=jnp.zeros((n, 2), jnp.float32),
            category=jnp.zeros(n, jnp.int32),
        )

    A, B = [0.0, 0.0, 3.0], [4.0, 0.0, 3.0]
    # keyframe 0: A and B
    state = keyframe_step_devdet(state, det([A, B]), meta_at(0), pst, cfg, 4)
    assert int(state.n) == 2
    # keyframe 1 (frame gap): A re-observed -> suppressed into A, valid_num+1
    state = keyframe_step_devdet(state, det([A]), meta_at(gap), pst, cfg, 4)
    assert int(state.n) == 2
    # keyframe 2 (frame 2*gap): B (frame_id 0, never re-observed) is dropped
    state = keyframe_step_devdet(state, det([A]), meta_at(2 * gap), pst, cfg, 4)
    centers = np.asarray(state.xyzlhw[: int(state.n), :3])
    assert int(state.n) == 1, centers
    np.testing.assert_allclose(centers[0], A, atol=1e-4)


def test_device_resident_labeling_matches_host_path():
    """When the detector exports the device image, open-vocab labeling runs
    fully on device (no D2H) and must reproduce the host labeling path:
    same categories, same CLIP score boost, same background drops."""
    import jax.numpy as jnp

    from boxfusion_tpu.models.clip.head import OpenVocabLabeler
    from boxfusion_tpu.models.clip.model import CLIPConfig

    cfg = _cfg()
    cfg["box_fusion"]._data["clip_sim_coeff"] = 2.0

    tiny = CLIPConfig(
        patch=32, width=64, layers=2, heads=2, embed_dim=32,
        vocab_size=64, context_length=8, text_width=64, text_layers=1, text_heads=2,
    )
    tf = np.random.RandomState(0).randn(4, 32).astype(np.float32)
    classes = ["chair", "table", "sofa", "lamp"]

    seq = SyntheticSequence(n_frames=15, n_boxes=3, seed=5)
    oracle = OracleDetector(seq, noise=0.0)

    host_labeler = OpenVocabLabeler(classes, tf, cfg=tiny, sim_thres=-1e9, max_boxes=16).init_random()
    host = DevicePipeline(cfg, oracle, labeler=host_labeler, capacity=64)
    host_world = host.run(seq, gap=5)

    class DeviceOracle:
        def __call__(self, frame):
            det = {k: jnp.asarray(v) for k, v in oracle(frame).items()}
            det["image_dev"] = jnp.asarray(frame.image, jnp.float32)
            return det

    dev_labeler = OpenVocabLabeler(classes, tf, cfg=tiny, sim_thres=-1e9, max_boxes=16).init_random(0)
    dev = DevicePipeline(cfg, DeviceOracle(), labeler=dev_labeler, capacity=64)
    dev_world = dev.run(seq, gap=5)

    assert len(dev_world["scores"]) == len(host_world["scores"])
    od = np.argsort(dev_world["init_id"])
    oh = np.argsort(host_world["init_id"])
    np.testing.assert_array_equal(
        np.asarray(dev_world["init_id"])[od], np.asarray(host_world["init_id"])[oh]
    )
    assert [dev_world["categories"][i] for i in od] == [
        host_world["categories"][i] for i in oh
    ]
    np.testing.assert_allclose(
        np.asarray(dev_world["scores"])[od],
        np.asarray(host_world["scores"])[oh],
        atol=1e-4,
    )


def test_device_labeling_background_dropped():
    """sim_thres above every similarity labels everything background ->
    the device step's score filter must drop all detections."""
    import jax.numpy as jnp

    from boxfusion_tpu.models.clip.head import OpenVocabLabeler
    from boxfusion_tpu.models.clip.model import CLIPConfig

    cfg = _cfg()
    tiny = CLIPConfig(
        patch=32, width=64, layers=2, heads=2, embed_dim=32,
        vocab_size=64, context_length=8, text_width=64, text_layers=1, text_heads=2,
    )
    tf = np.random.RandomState(0).randn(4, 32).astype(np.float32)
    labeler = OpenVocabLabeler(
        ["chair", "table", "sofa", "lamp"], tf, cfg=tiny, sim_thres=1e9, max_boxes=16
    ).init_random()

    seq = SyntheticSequence(n_frames=10, n_boxes=3, seed=5)
    oracle = OracleDetector(seq, noise=0.0)

    class DeviceOracle:
        def __call__(self, frame):
            det = {k: jnp.asarray(v) for k, v in oracle(frame).items()}
            det["image_dev"] = jnp.asarray(frame.image, jnp.float32)
            return det

    dev = DevicePipeline(cfg, DeviceOracle(), labeler=labeler, capacity=64)
    world = dev.run(seq, gap=5)
    assert len(world["scores"]) == 0


def test_device_matches_host_pipeline_noisy_fusion():
    """Host and device engines stay aligned THROUGH fusion (noisy oracle).

    Fusion must move xyzlhw while each box keeps its OWN R (reference
    box_fusion.py:716-724 writes .tensor[i] only), and the fused flags must
    agree after compaction on both engines.
    """
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=40, n_boxes=4, seed=3)
    host = OnlinePipeline(cfg, OracleDetector(seq, noise=0.04, seed=7))
    host_world = host.run(seq, gap=5)
    dev = DevicePipeline(cfg, OracleDetector(seq, noise=0.04, seed=7), capacity=64)
    dev_world = dev.run(seq, gap=5)

    assert len(dev_world["scores"]) == len(host_world)
    np.testing.assert_array_equal(
        np.sort(dev_world["init_id"]), np.sort(host_world.arrays["init_id"])
    )
    order_d = np.argsort(dev_world["init_id"])
    order_h = np.argsort(host_world.arrays["init_id"])
    np.testing.assert_allclose(
        dev_world["xyzlhw"][order_d],
        host_world.arrays["xyzlhw"][order_h],
        atol=5e-3,
    )
    np.testing.assert_allclose(
        dev_world["R"][order_d], host_world.arrays["R"][order_h], atol=1e-5
    )
    assert dev_world["fusion_flag"].any()
    np.testing.assert_array_equal(
        dev_world["fusion_flag"][order_d].astype(bool),
        np.asarray(host.manager.fusion_flag, bool)[order_h],
    )


def test_worker_error_propagates_mid_run(monkeypatch):
    """A keyframe-step failure in the worker thread must surface on a LATER
    call, not be silently swallowed when it isn't the last submitted step."""
    import time as _time

    import boxfusion_tpu.runtime.device_pipeline as dp

    cfg = _cfg()
    seq = SyntheticSequence(n_frames=10, n_boxes=3, seed=0)
    frames = list(seq)
    pipe = dp.DevicePipeline(cfg, OracleDetector(seq), capacity=64)

    real = dp.keyframe_step_packed

    def boom(*a, **k):
        raise ValueError("injected step failure")

    monkeypatch.setattr(dp, "keyframe_step_packed", boom)
    pipe.process_keyframe(frames[0])          # fails inside the worker
    for _ in range(100):                      # let the worker run
        if pipe._worker_error is not None:
            break
        _time.sleep(0.05)
    monkeypatch.setattr(dp, "keyframe_step_packed", real)

    with pytest.raises(RuntimeError, match="worker"):
        pipe.process_keyframe(frames[5])      # surfaced here, not lost

"""Fused single-dispatch keyframe path vs the multi-dispatch device path.

The fused program (runtime/fused.py) traces packaging + CuTR + CLIP +
keyframe step into one executable fed by one packed byte buffer; these
tests assert it reproduces the step-by-step device pipeline exactly
(depth_mode "f32" is bit-identical; "u16" quantizes depth to mm).
"""
import numpy as np
import pytest

from boxfusion_tpu.data.synthetic import SyntheticSequence
from boxfusion_tpu.models.cutr import make_cutr
from boxfusion_tpu.runtime.detector import CuTRDetector
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
from boxfusion_tpu.runtime.fused import FUSED_META_WIDTH, FusedDevicePipeline
from boxfusion_tpu.utils.config import load_config


def _cfg():
    c = load_config("config/ca1m.yaml")
    c["data"]._data["gap"] = 5
    c["detection"]._data["score_thresh"] = 0.1
    c["detection"]._data["uv_bound"] = False
    c["detection"]._data["floor_mask"] = False
    c["detection"]._data["max_detections"] = 16
    c["box_fusion"]._data["pst_path"] = None
    c["box_fusion"]._data["pst_size"] = 128
    c["box_fusion"]._data["iters"] = 4
    c["box_fusion"]._data["max_fusions_per_frame"] = 4
    c["association"]._data["max_views"] = 5
    return c


@pytest.fixture(scope="module")
def cutr():
    import jax

    model = make_cutr(dimension=192, depth_model=True)
    seq = SyntheticSequence(n_frames=1, n_boxes=3, seed=0)
    frame = next(iter(seq))
    from boxfusion_tpu.data.preprocess import Preprocessor

    batch, _, _ = Preprocessor()(frame.image, frame.depth, frame.K, frame.T_gravity)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    return model, params


def _mm_quantized_frames(seq):
    """Frames whose depth is exactly representable as u16 mm, so the fused
    u16 transfer is lossless and outputs can be compared exactly."""
    frames = []
    for f in seq:
        import dataclasses

        d = np.round(f.depth * 1000.0) / 1000.0
        frames.append(dataclasses.replace(f, depth=d.astype(np.float32)))
    return frames


def test_fused_matches_device_pipeline(cutr):
    model, params = cutr
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=11, n_boxes=4, seed=3)
    frames = _mm_quantized_frames(seq)

    ref = DevicePipeline(
        cfg, CuTRDetector(model, params, device_output=True), capacity=64
    )
    ref_world = ref.run(frames, gap=5)

    fused = FusedDevicePipeline(
        cfg, CuTRDetector(model, params), capacity=64, depth_mode="u16"
    )
    fused_world = fused.run(frames, gap=5)

    assert len(fused_world["scores"]) == len(ref_world["scores"])
    of = np.argsort(fused_world["init_id"])
    orr = np.argsort(ref_world["init_id"])
    np.testing.assert_array_equal(
        np.asarray(fused_world["init_id"])[of], np.asarray(ref_world["init_id"])[orr]
    )
    np.testing.assert_allclose(
        np.asarray(fused_world["xyzlhw"])[of],
        np.asarray(ref_world["xyzlhw"])[orr],
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(fused_world["scores"])[of],
        np.asarray(ref_world["scores"])[orr],
        atol=1e-6,
    )


def test_fused_with_labeler_matches_device_pipeline(cutr):
    import jax.numpy as jnp

    from boxfusion_tpu.models.clip.head import OpenVocabLabeler
    from boxfusion_tpu.models.clip.model import CLIPConfig

    model, params = cutr
    cfg = _cfg()
    cfg["box_fusion"]._data["clip_sim_coeff"] = 2.0

    tiny = CLIPConfig(
        patch=32, width=64, layers=2, heads=2, embed_dim=32,
        vocab_size=64, context_length=8, text_width=64, text_layers=1, text_heads=2,
    )
    tf = np.random.RandomState(0).randn(4, 32).astype(np.float32)
    classes = ["chair", "table", "sofa", "lamp"]

    seq = SyntheticSequence(n_frames=11, n_boxes=4, seed=3)
    frames = _mm_quantized_frames(seq)

    ref = DevicePipeline(
        cfg,
        CuTRDetector(model, params, device_output=True, export_image=True),
        labeler=OpenVocabLabeler(classes, tf, cfg=tiny, sim_thres=-1e9, max_boxes=16).init_random(0),
        capacity=64,
    )
    ref_world = ref.run(frames, gap=5)

    fused = FusedDevicePipeline(
        cfg,
        CuTRDetector(model, params),
        labeler=OpenVocabLabeler(classes, tf, cfg=tiny, sim_thres=-1e9, max_boxes=16).init_random(0),
        capacity=64,
        depth_mode="u16",
    )
    fused_world = fused.run(frames, gap=5)

    assert len(fused_world["scores"]) == len(ref_world["scores"])
    of = np.argsort(fused_world["init_id"])
    orr = np.argsort(ref_world["init_id"])
    np.testing.assert_array_equal(
        np.asarray(fused_world["init_id"])[of], np.asarray(ref_world["init_id"])[orr]
    )
    assert [fused_world["categories"][i] for i in of] == [
        ref_world["categories"][i] for i in orr
    ]
    np.testing.assert_allclose(
        np.asarray(fused_world["scores"])[of],
        np.asarray(ref_world["scores"])[orr],
        atol=1e-5,
    )


def test_packed_buffer_roundtrip(cutr):
    """The byte-packed transfer decodes to the exact pixels/meta."""
    import jax

    model, params = cutr
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=1, n_boxes=3, seed=0)
    frame = _mm_quantized_frames(seq)[0]

    pipe = FusedDevicePipeline(cfg, CuTRDetector(model, params), capacity=64)
    buf = pipe._pack_buffer(frame)
    h, w = frame.image.shape[:2]
    dh, dw = frame.depth.shape[:2]
    n_img, n_dep = h * w * 3, dh * dw * 2
    assert buf.shape[0] == n_img + n_dep + FUSED_META_WIDTH * 4

    img = buf[:n_img].reshape(h, w, 3)
    np.testing.assert_array_equal(img, frame.image)
    depth = buf[n_img : n_img + n_dep].view("<u2").reshape(dh, dw) / 1000.0
    np.testing.assert_allclose(depth, frame.depth, atol=1e-6)
    meta = buf[n_img + n_dep :].view("<f4")
    np.testing.assert_array_equal(meta[:16], frame.gt_pose.ravel())
    np.testing.assert_array_equal(meta[16:25], frame.K.ravel())
    assert meta[34] == h and meta[35] == w and meta[46] == 1000.0


def test_fused_pipeline_pinned_to_nondefault_device(cutr):
    """device= pins EVERY operand (state, pst, uploads, detector params) to
    the given device; a partial pin would raise 'incompatible devices' from
    the jitted fused program on the worker thread (multi-device fan-outs)."""
    import jax

    model, params = cutr
    dev = jax.devices()[1]  # conftest provisions 8 virtual CPU devices
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=6, n_boxes=3, seed=5)
    frames = _mm_quantized_frames(seq)

    # params deliberately committed to device 0 (jit init default): the
    # pipeline must re-pin them rather than feed mixed-device operands
    pipe = FusedDevicePipeline(
        cfg, CuTRDetector(model, params), capacity=64, device=dev
    )
    world = pipe.run(frames, gap=5)
    assert list(pipe.state.n.devices()) == [dev]
    assert world["stats"]["keyframes"] == 2


def test_fused_pipeline_from_disk_via_prefetcher(cutr, tmp_path):
    """bench.py's I/O-inclusive path: a synthetic sequence serialized to the
    CA-1M layout, streamed back by CA1MDataset through the threaded
    Prefetcher into the fused pipeline, produces the SAME world as feeding
    the materialized read-back frames directly (the prefetch thread and the
    disk decode must not change any decision)."""
    from boxfusion_tpu.data.readers import CA1MDataset, write_ca1m_sequence
    from boxfusion_tpu.native import Prefetcher

    model, params = cutr
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=11, n_boxes=4, seed=3)
    out = tmp_path / "42898867"
    write_ca1m_sequence(_mm_quantized_frames(seq), str(out))

    cfg["data"]._data["datadir"] = str(out)
    cfg["data"]._data["start"] = 0
    h, w = seq.image_hw
    cfg["cam"]._data["H"] = w
    cfg["cam"]._data["W"] = h
    cfg["cam"]._data["png_depth_scale"] = 1000.0
    ds = CA1MDataset(cfg)
    frames = list(ds)
    assert len(frames) == 11

    base = FusedDevicePipeline(
        cfg, CuTRDetector(model, params), capacity=64, depth_mode="u16"
    )
    base_world = base.run(frames, gap=5)

    streamed = FusedDevicePipeline(
        cfg, CuTRDetector(model, params), capacity=64, depth_mode="u16"
    )
    streamed_world = streamed.run(Prefetcher(CA1MDataset(cfg), depth=3), gap=5)

    assert streamed.count == 11
    bo = np.argsort(base_world["init_id"])
    so = np.argsort(streamed_world["init_id"])
    np.testing.assert_array_equal(
        np.asarray(streamed_world["init_id"])[so],
        np.asarray(base_world["init_id"])[bo],
    )
    np.testing.assert_allclose(
        np.asarray(streamed_world["xyzlhw"])[so],
        np.asarray(base_world["xyzlhw"])[bo],
        atol=1e-6,
    )


def test_chunked_matches_per_frame_dispatch(cutr):
    """chunk>1 (one lax.scan dispatch per group of keyframes,
    make_fused_chunk_fn) must make bit-identical decisions to chunk=1 --
    state chains inside the scan in frame order.  gap=1 with a frame count
    that leaves a partial tail group exercises grouping, the scan program,
    AND the partial-chunk flush path."""
    model, params = cutr
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=8, n_boxes=4, seed=5)
    frames = _mm_quantized_frames(seq)

    base = FusedDevicePipeline(
        cfg, CuTRDetector(model, params), capacity=64, depth_mode="u16"
    )
    base_world = base.run(frames, gap=1)

    chunked = FusedDevicePipeline(
        cfg, CuTRDetector(model, params), capacity=64, depth_mode="u16",
        chunk=3,
    )
    chunked_world = chunked.run(frames, gap=1)

    assert len(chunked_world["scores"]) == len(base_world["scores"])
    co = np.argsort(chunked_world["init_id"])
    bo = np.argsort(base_world["init_id"])
    np.testing.assert_array_equal(
        np.asarray(chunked_world["init_id"])[co],
        np.asarray(base_world["init_id"])[bo],
    )
    np.testing.assert_allclose(
        np.asarray(chunked_world["xyzlhw"])[co],
        np.asarray(base_world["xyzlhw"])[bo],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(chunked_world["scores"])[co],
        np.asarray(base_world["scores"])[bo],
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(chunked_world["stats"]["keyframes"]),
        np.asarray(base_world["stats"]["keyframes"]),
    )


def test_bucketed_labeling_matches_full_budget(cutr):
    """label_bucketing=True (per-keyframe lax.switch into the smallest crop
    bucket covering the live count, runtime/fused.py::label_boost_core) must
    make bit-identical decisions to the fixed full-budget pad: live rows are
    a score-sorted prefix, so any bucket >= the live count labels exactly
    the rows the step will keep.  score_thresh varies the live count across
    keyframes so several buckets (including 0 on empty keyframes) execute."""
    import jax.numpy as jnp

    from boxfusion_tpu.models.clip.head import OpenVocabLabeler
    from boxfusion_tpu.models.clip.model import CLIPConfig

    model, params = cutr
    tiny = CLIPConfig(
        patch=32, width=64, layers=2, heads=2, embed_dim=32,
        vocab_size=64, context_length=8, text_width=64, text_layers=1,
        text_heads=2,
    )
    tf = np.random.RandomState(0).randn(4, 32).astype(np.float32)
    classes = ["chair", "table", "sofa", "lamp"]
    seq = SyntheticSequence(n_frames=11, n_boxes=4, seed=3)
    frames = _mm_quantized_frames(seq)

    worlds = {}
    for bucketing in (False, True):
        cfg = _cfg()
        cfg["box_fusion"]._data["clip_sim_coeff"] = 2.0
        cfg["detection"]._data["label_bucketing"] = bucketing
        pipe = FusedDevicePipeline(
            cfg,
            CuTRDetector(model, params),
            labeler=OpenVocabLabeler(
                classes, tf, cfg=tiny, sim_thres=-1e9, max_boxes=16
            ).init_random(0),
            capacity=64,
            depth_mode="u16",
        )
        worlds[bucketing] = pipe.run(frames, gap=5)

    full, bucketed = worlds[False], worlds[True]
    assert len(bucketed["scores"]) == len(full["scores"])
    bo = np.argsort(bucketed["init_id"])
    fo = np.argsort(full["init_id"])
    np.testing.assert_array_equal(
        np.asarray(bucketed["init_id"])[bo], np.asarray(full["init_id"])[fo]
    )
    assert [bucketed["categories"][i] for i in bo] == [
        full["categories"][i] for i in fo
    ]
    np.testing.assert_allclose(
        np.asarray(bucketed["scores"])[bo],
        np.asarray(full["scores"])[fo],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(bucketed["xyzlhw"])[bo],
        np.asarray(full["xyzlhw"])[fo],
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(bucketed["stats"]["label_overflow"]),
        np.asarray(full["stats"]["label_overflow"]),
    )


def test_label_buckets_for():
    from boxfusion_tpu.runtime.fused import label_buckets_for

    assert label_buckets_for(128) == (0, 32, 64, 96, 112, 128)
    assert label_buckets_for(96) == (0, 32, 64, 96)
    assert label_buckets_for(48) == (0, 32, 48)
    assert label_buckets_for(32) == (0, 32)
    assert label_buckets_for(16) == (0, 16)


def test_chunk_applies_at_any_gap(cutr):
    """chunk>1 chunks the keyframe dispatches at EVERY gap: the r5 A/B
    (BENCH_r05) shows the scanned chunk winning both profiles (gap=1 and
    gap=20), so the former gap>chunk auto-disable is gone (chunk_auto is a
    kept-for-API no-op).  Observed via which programs were compiled (the
    _fused_fns cache keys carry the chunk length)."""
    model, params = cutr
    cfg = _cfg()
    seq = SyntheticSequence(n_frames=8, n_boxes=3, seed=5)
    frames = _mm_quantized_frames(seq)

    pipe = FusedDevicePipeline(
        cfg, CuTRDetector(model, params), capacity=64, chunk=3
    )
    pipe.run(frames, gap=5)  # gap > chunk: still chunked (r5 A/B)
    assert any(k[1] == 3 for k in pipe._fused_fns)

    pipe.reset()
    pipe.run(frames, gap=1)
    assert any(k[1] == 3 for k in pipe._fused_fns)

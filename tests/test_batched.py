"""Batched multi-sequence pipeline vs per-sequence DevicePipeline parity."""
import jax
import numpy as np
import pytest

from boxfusion_tpu.data.preprocess import Preprocessor
from boxfusion_tpu.data.synthetic import SyntheticSequence
from boxfusion_tpu.models.cutr import make_cutr
from boxfusion_tpu.runtime.batched import BatchedPipeline
from boxfusion_tpu.runtime.detector import CuTRDetector
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
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
    model = make_cutr(dimension=192, depth_model=True)
    seq = SyntheticSequence(n_frames=1, n_boxes=3, seed=0)
    frame = next(iter(seq))
    batch, _, _ = Preprocessor()(frame.image, frame.depth, frame.K, frame.T_gravity)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    return model, params


def test_batched_lanes_match_single_pipelines(cutr):
    """Each lane of the vmapped lockstep run must reproduce the world a
    dedicated single-sequence DevicePipeline builds from the same frames
    (vmap preserves per-lane keyframe-step semantics)."""
    model, params = cutr
    cfg = _cfg()
    # different lengths: lane 1 exhausts first and must go inactive cleanly
    lengths = (11, 6, 16)
    seqs = [
        list(SyntheticSequence(n_frames=n, n_boxes=3, seed=s))
        for s, n in enumerate(lengths)
    ]

    batched = BatchedPipeline(cfg, CuTRDetector(model, params), n_lanes=3,
                              capacity=64)
    worlds = batched.run([iter(s) for s in seqs], gap=5)
    assert len(worlds) == 3

    for lane, frames in enumerate(seqs):
        ref = DevicePipeline(
            cfg, CuTRDetector(model, params, device_output=True), capacity=64
        )
        ref_world = ref.run(frames, gap=5)
        got = worlds[lane]
        assert len(got["scores"]) == len(ref_world["scores"]), lane
        go = np.argsort(np.asarray(got["init_id"]))
        ro = np.argsort(np.asarray(ref_world["init_id"]))
        np.testing.assert_array_equal(
            np.asarray(got["init_id"])[go], np.asarray(ref_world["init_id"])[ro]
        )
        np.testing.assert_allclose(
            np.asarray(got["xyzlhw"])[go],
            np.asarray(ref_world["xyzlhw"])[ro],
            atol=1e-4,
        )
        assert got["stats"]["keyframes"] == ref_world["stats"]["keyframes"], lane


def test_batched_reset_tail_group_and_deferred_export(cutr):
    """One pipeline reused across groups (the eval runner's pattern):
    reset() clears the lanes, a TAIL group smaller than n_lanes runs on the
    same compiled programs with spare lanes inactive, and export=False
    defers every D2H until export_worlds()."""
    model, params = cutr
    cfg = _cfg()
    seqs = [
        list(SyntheticSequence(n_frames=6, n_boxes=3, seed=s)) for s in range(3)
    ]

    pipe = BatchedPipeline(cfg, CuTRDetector(model, params), n_lanes=2,
                           capacity=64)
    assert pipe.run([iter(seqs[0]), iter(seqs[1])], gap=5, export=False) is None
    group1 = pipe.export_worlds()
    assert len(group1) == 2 and len(pipe.lane_fps) == 2

    pipe.reset()
    tail = pipe.run([iter(seqs[2])], gap=5)  # 1 sequence < 2 lanes
    assert len(tail) == 1 and len(pipe.lane_fps) == 1

    for world, frames in zip(group1 + tail, seqs):
        ref = DevicePipeline(
            cfg, CuTRDetector(model, params, device_output=True), capacity=64
        )
        ref_world = ref.run(frames, gap=5)
        assert len(world["scores"]) == len(ref_world["scores"])
        go = np.argsort(np.asarray(world["init_id"]))
        ro = np.argsort(np.asarray(ref_world["init_id"]))
        np.testing.assert_allclose(
            np.asarray(world["xyzlhw"])[go],
            np.asarray(ref_world["xyzlhw"])[ro],
            atol=1e-4,
        )


def test_packed_transport_matches_arrays(cutr):
    """transport='packed' (one stacked byte upload + one dispatch per
    round) must build the same worlds as the arrays transport.  f32 depth
    mode is bit-exact for synthetic float depth; u16 mode is additionally
    smoke-checked (millimetre quantization, the dataset-lossless path)."""
    model, params = cutr
    cfg = _cfg()
    seqs = [
        list(SyntheticSequence(n_frames=11, n_boxes=3, seed=s)) for s in range(2)
    ]

    arrays = BatchedPipeline(cfg, CuTRDetector(model, params), n_lanes=2,
                             capacity=64)
    w_arr = arrays.run([iter(s) for s in seqs], gap=5)

    packed = BatchedPipeline(cfg, CuTRDetector(model, params), n_lanes=2,
                             capacity=64, transport="packed",
                             depth_mode="f32")
    w_pk = packed.run([iter(s) for s in seqs], gap=5)

    for lane, (a, b) in enumerate(zip(w_arr, w_pk)):
        assert len(a["scores"]) == len(b["scores"]), lane
        ao = np.argsort(np.asarray(a["init_id"]))
        bo = np.argsort(np.asarray(b["init_id"]))
        np.testing.assert_array_equal(
            np.asarray(a["init_id"])[ao], np.asarray(b["init_id"])[bo]
        )
        np.testing.assert_allclose(
            np.asarray(a["xyzlhw"])[ao], np.asarray(b["xyzlhw"])[bo],
            atol=1e-4,
        )

    # u16 depth (lossless for on-disk u16 datasets): runs and stays close
    pk16 = BatchedPipeline(cfg, CuTRDetector(model, params), n_lanes=2,
                           capacity=64, transport="packed",
                           depth_mode="u16", depth_scale=1000.0)
    w16 = pk16.run([iter(s) for s in seqs], gap=5)
    assert all(w["stats"]["keyframes"] == w_arr[i]["stats"]["keyframes"]
               for i, w in enumerate(w16))


def test_packed_with_labeler_matches_fused(cutr):
    """Batched packed transport WITH open-vocab labeling: every lane's
    world (boxes, scores incl. CLIP boost, categories, overflow counter)
    must match a dedicated FusedDevicePipeline run of the same frames --
    the labeling semantics are the fused engine's with a lane axis."""
    import dataclasses as dc

    from boxfusion_tpu.models.clip.head import OpenVocabLabeler
    from boxfusion_tpu.models.clip.model import CLIPConfig
    from boxfusion_tpu.runtime.fused import FusedDevicePipeline

    model, params = cutr
    cfg = _cfg()
    cfg["box_fusion"]._data["clip_sim_coeff"] = 2.0

    tiny = CLIPConfig(
        patch=32, width=64, layers=2, heads=2, embed_dim=32,
        vocab_size=64, context_length=8, text_width=64, text_layers=1,
        text_heads=2,
    )
    tf = np.random.RandomState(0).randn(4, 32).astype(np.float32)
    classes = ["chair", "table", "sofa", "lamp"]

    def mk_labeler():
        return OpenVocabLabeler(
            classes, tf, cfg=tiny, sim_thres=-1e9, max_boxes=16
        ).init_random(0)

    def mm(seq):  # u16-mm-exact depth so the packed transfer is lossless
        return [
            dc.replace(f, depth=(np.round(f.depth * 1000.0) / 1000.0)
                       .astype(np.float32))
            for f in seq
        ]

    seqs = [mm(SyntheticSequence(n_frames=11, n_boxes=3, seed=s))
            for s in (1, 4)]

    batched = BatchedPipeline(
        cfg, CuTRDetector(model, params), n_lanes=2, capacity=64,
        transport="packed", depth_mode="u16", labeler=mk_labeler(),
    )
    worlds = batched.run([iter(s) for s in seqs], gap=5)

    for lane, frames in enumerate(seqs):
        ref = FusedDevicePipeline(
            cfg, CuTRDetector(model, params), labeler=mk_labeler(),
            capacity=64, depth_mode="u16",
        )
        ref_world = ref.run(frames, gap=5)
        got = worlds[lane]
        assert len(got["scores"]) == len(ref_world["scores"]), lane
        go = np.argsort(np.asarray(got["init_id"]))
        ro = np.argsort(np.asarray(ref_world["init_id"]))
        np.testing.assert_array_equal(
            np.asarray(got["init_id"])[go], np.asarray(ref_world["init_id"])[ro]
        )
        np.testing.assert_allclose(
            np.asarray(got["scores"])[go],
            np.asarray(ref_world["scores"])[ro], atol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(got["category"])[go],
            np.asarray(ref_world["category"])[ro],
        )
        # open-vocab string labels present and consistent with the ids
        label_of = classes + [""]
        assert got["categories"] == [
            label_of[int(c)] for c in np.asarray(got["category"])
        ]
        np.testing.assert_allclose(
            np.asarray(got["xyzlhw"])[go],
            np.asarray(ref_world["xyzlhw"])[ro], atol=1e-4,
        )
        assert got["stats"]["label_overflow"] == ref_world["stats"]["label_overflow"], lane


def test_pad_detections_batched_matches_single():
    """The shared padding contract: running pad_detections on a (B, N, ...)
    stack equals stacking per-frame (N, ...) results."""
    import jax.numpy as jnp

    from boxfusion_tpu.runtime.device_step import pad_detections

    rng = np.random.RandomState(0)
    B, N, kmax = 3, 5, 8
    det_b = dict(
        scores=jnp.asarray(rng.rand(B, N), jnp.float32),
        pred_boxes=jnp.asarray(rng.rand(B, N, 4), jnp.float32),
        boxes3d=jnp.asarray(rng.rand(B, N, 6), jnp.float32),
        R=jnp.asarray(rng.rand(B, N, 3, 3), jnp.float32),
        proj_xy=jnp.asarray(rng.rand(B, N, 2), jnp.float32),
    )
    got = pad_detections(det_b, kmax)
    for b in range(B):
        single = pad_detections(
            {k: v[b] for k, v in det_b.items()}, kmax
        )
        for k in got:
            np.testing.assert_array_equal(
                np.asarray(got[k][b]), np.asarray(single[k]), err_msg=k
            )
    # padded rows: dead scores, benign unit dims, background-free category 0
    assert np.all(np.asarray(got["scores"])[:, N:] == -1e9)
    assert np.all(np.asarray(got["boxes3d"])[:, N:, 3:] == 1.0)
    assert got["category"].dtype == jnp.int32
    # truncation keeps the leading rows untouched
    trunc = pad_detections(det_b, 4)
    np.testing.assert_array_equal(
        np.asarray(trunc["scores"]), np.asarray(det_b["scores"][:, :4])
    )

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

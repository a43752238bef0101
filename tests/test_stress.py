"""Dense-scene stress: 1000 GT boxes through the online engines.

The reference's long-scene risk is its O(N^2) python NMS scan (SURVEY.md
section 5, reference instances.py:58-97); this build's analogue is its
fixed capacities (world slots, observation bank, gated-IoU budget).  These
tests demonstrate the required behavior on a 1k-box scene: decisions stay
faithful (device engine == host engine) when capacity suffices, and
degradation is LOUD (stats counters) when it does not.
"""
import numpy as np

from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
from boxfusion_tpu.runtime import OnlinePipeline
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
from boxfusion_tpu.utils.config import load_config


def _cfg(max_det=64):
    c = load_config("config/ca1m.yaml")
    c["data"]._data["gap"] = 5
    c["detection"]._data["score_thresh"] = 0.3
    c["detection"]._data["uv_bound"] = False
    c["detection"]._data["floor_mask"] = False
    c["detection"]._data["max_detections"] = max_det
    c["box_fusion"]._data["use"] = False  # isolate association under load
    c["box_fusion"]._data["pst_path"] = None
    c["box_fusion"]._data["pst_size"] = 128
    c["association"]._data["max_views"] = 5
    return c


class _CappedOracle:
    """Oracle truncated to the step's detection budget so the host engine
    sees the identical stream (it has no kmax cap of its own)."""

    def __init__(self, seq, max_det, seed):
        self.oracle = OracleDetector(seq, noise=0.0, seed=seed)
        self.max_det = max_det

    def __call__(self, frame):
        det = self.oracle(frame)
        return {k: v[: self.max_det] for k, v in det.items()}


def test_1k_boxes_faithful_when_capacity_suffices():
    cfg = _cfg(max_det=64)
    seq = SyntheticSequence(n_frames=15, n_boxes=1000, image_hw=(96, 128), seed=0)
    frames = list(seq)

    host = OnlinePipeline(cfg, _CappedOracle(seq, 64, seed=1))
    host_world = host.run(frames, gap=5)

    dev = DevicePipeline(cfg, _CappedOracle(seq, 64, seed=1), capacity=512)
    dev_world = dev.run(frames, gap=5)

    st = dev_world["stats"]
    # gap multiples 0/5/10 plus the reference's last-frame rule (frame 14;
    # reference demo.py:200)
    assert st["keyframes"] == 4
    assert st["dropped_world_capacity"] == 0
    assert st["dropped_obs_capacity"] == 0
    # the faithfulness comparison below is only meaningful when the gated
    # pair load fit the budget on both engines
    assert st["truncated_gated_pairs"] == 0

    # identical decisions under load (the faithfulness claim)
    assert len(dev_world["scores"]) == len(host_world)
    od = np.argsort(dev_world["init_id"])
    oh = np.argsort(host_world.arrays["init_id"])
    np.testing.assert_array_equal(
        dev_world["init_id"][od], host_world.arrays["init_id"][oh]
    )
    np.testing.assert_allclose(
        dev_world["xyzlhw"][od], host_world.arrays["xyzlhw"][oh], atol=1e-4
    )


def test_overflow_degrades_loudly(capsys):
    """A deliberately tiny world set must drop detections AND say so."""
    cfg = _cfg(max_det=64)
    seq = SyntheticSequence(n_frames=15, n_boxes=1000, image_hw=(96, 128), seed=0)
    frames = list(seq)

    dev = DevicePipeline(cfg, _CappedOracle(seq, 64, seed=1), capacity=24)
    dev_world = dev.run(frames, gap=5)

    st = dev_world["stats"]
    assert st["dropped_world_capacity"] > 0
    assert len(dev_world["scores"]) <= 24
    # live rows only: no corruption of the packed prefix
    assert np.all(np.isfinite(dev_world["xyzlhw"]))
    out = capsys.readouterr().out
    assert "capacity overflow" in out


def test_gated_pair_truncation_counted():
    """max_gated_pairs below the pair load must be counted and reported."""
    import dataclasses as dc

    from boxfusion_tpu.runtime.device_pipeline import step_config_from

    cfg = _cfg(max_det=64)
    seq = SyntheticSequence(n_frames=15, n_boxes=1000, image_hw=(96, 128), seed=0)
    frames = list(seq)

    dev = DevicePipeline(cfg, _CappedOracle(seq, 64, seed=1), capacity=512)
    dev.step_cfg = dc.replace(dev.step_cfg, max_gated_pairs=8)
    dev_world = dev.run(frames, gap=5)
    assert dev_world["stats"]["truncated_gated_pairs"] > 0


def test_fusion_list_merge_truncation_counted():
    """_record_core merging two member lists past max_views must surface the
    dropped-member count in stats[5] (the reference's Python lists are
    unbounded there, box_manager.py:59-77 -- a silent cap would diverge
    without a trace)."""
    import jax.numpy as jnp

    from boxfusion_tpu.runtime.device_pipeline import step_config_from
    from boxfusion_tpu.runtime.device_step import _record_core

    cfg = step_config_from(load_config("config/ca1m.yaml"))
    V = 4
    G = 8
    # two multi-view slots: i holds 3 members, j holds 4 -> merge wants 7,
    # the row holds V=4 -> 3 dropped
    flist = np.full((G, V), 2**30, np.int32)
    flist[0, :3] = [0, 1, 2]
    flist[1, :4] = [3, 4, 5, 6]
    fcount = np.zeros(G, np.int32)
    fcount[0], fcount[1] = 3, 4
    # far-apart poses so members_differ passes every gate
    obs_pose = np.tile(np.eye(4, dtype=np.float32)[None], (8, 1, 1))
    obs_pose[:, 0, 3] = 10.0 * np.arange(8)
    init_id = np.arange(G, dtype=np.int32)

    flist2, fcount2, _, _, trunc = _record_core(
        jnp.asarray(flist), jnp.asarray(fcount),
        jnp.zeros(G, bool), jnp.ones(G, bool),
        0, 1, jnp.bool_(True), jnp.asarray(obs_pose), jnp.asarray(init_id), cfg,
    )
    assert int(fcount2[0]) == V
    assert int(trunc) == 3
    # the kept members are the V smallest obs ids
    assert sorted(np.asarray(flist2[0]).tolist()) == [0, 1, 2, 3]

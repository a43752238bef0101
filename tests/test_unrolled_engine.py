"""The unrolled (loop-primitive-free) keyframe engine must make decisions
IDENTICAL to the lax.while_loop engine.

The unrolled engine exists for the axon tunnel, whose while-loop dispatch
path permanently degrades the process (docs/TUNNEL_PERF_NOTES.md); it
replays the greedy NMS / manager bookkeeping / correspondence sequence as
straight-line cond-gated HLO.  These tests run both engines on the same
synthetic workloads (CPU) and require equal world state -- integer fields
exact, float fields bit-tight.
"""
import dataclasses

import numpy as np
import pytest

from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
from boxfusion_tpu.utils.config import load_config


def _cfg(engine):
    c = load_config("config/ca1m.yaml")
    c["data"]._data["gap"] = 5
    c["detection"]._data["score_thresh"] = 0.3
    c["detection"]._data["uv_bound"] = False
    c["detection"]._data["floor_mask"] = False
    c["detection"]._data["max_detections"] = 16
    c["box_fusion"]._data["pst_path"] = None
    c["box_fusion"]._data["pst_size"] = 128
    c["box_fusion"]._data["iters"] = 6
    c["box_fusion"]._data["max_fusions_per_frame"] = 4
    c["association"]._data["max_views"] = 5
    c["association"]._data["engine"] = engine
    return c


def _run(engine, noise, seed, n_frames=25, n_boxes=4, capacity=48):
    cfg = _cfg(engine)
    seq = SyntheticSequence(n_frames=n_frames, n_boxes=n_boxes, seed=seed)
    pipe = DevicePipeline(
        cfg, OracleDetector(seq, noise=noise, seed=seed + 1), capacity=capacity
    )
    world = pipe.run(seq, gap=5)
    return pipe, world


def _assert_worlds_equal(wa, wb):
    np.testing.assert_array_equal(wa["init_id"], wb["init_id"])
    np.testing.assert_array_equal(wa["fusion_flag"], wb["fusion_flag"])
    np.testing.assert_array_equal(wa["valid_num"], wb["valid_num"])
    assert wa["fusion_list"] == wb["fusion_list"]
    np.testing.assert_allclose(wa["xyzlhw"], wb["xyzlhw"], atol=1e-6, rtol=0)
    np.testing.assert_allclose(wa["scores"], wb["scores"], atol=1e-7, rtol=0)


@pytest.mark.parametrize("noise,seed", [(0.0, 0), (0.05, 3)])
def test_engine_parity_synthetic(noise, seed):
    _, w_loops = _run("loops", noise, seed)
    _, w_unrolled = _run("unrolled", noise, seed)
    _assert_worlds_equal(w_loops, w_unrolled)


def test_engine_parity_dense_overlaps():
    """Heavy-contention load: many overlapping detections per keyframe force
    long suppression chains, keep-swaps, and correspondence merges."""

    class CrowdedDetector:
        """Oracle detections plus jittered duplicates of every box."""

        def __init__(self, seq, seed):
            self.oracle = OracleDetector(seq, noise=0.02, seed=seed)
            self.rng = np.random.RandomState(seed + 7)

        def __call__(self, frame):
            det = self.oracle(frame)
            n = len(det["scores"])
            if n == 0:
                return det
            out = {}
            for k, v in det.items():
                dup = np.asarray(v).copy()
                if k == "scores":
                    dup = dup * self.rng.uniform(0.8, 1.2, dup.shape).astype(dup.dtype)
                elif k == "boxes3d":
                    dup[:, :3] += self.rng.uniform(-0.03, 0.03, (n, 3))
                out[k] = np.concatenate([np.asarray(v), dup], axis=0)
            return out

    worlds = {}
    for engine in ("loops", "unrolled"):
        cfg = _cfg(engine)
        seq = SyntheticSequence(n_frames=20, n_boxes=5, seed=11)
        pipe = DevicePipeline(cfg, CrowdedDetector(seq, seed=11), capacity=48)
        worlds[engine] = pipe.run(seq, gap=5)
    _assert_worlds_equal(worlds["loops"], worlds["unrolled"])


def test_unrolled_optimizer_matches_loop():
    """PSTOptConfig.unroll must not change the optimization trajectory."""
    import jax.numpy as jnp

    from boxfusion_tpu.fusion.optimizer import PSTOptConfig, optimize_boxes
    from boxfusion_tpu.fusion.pst import load_pst

    rng = np.random.RandomState(0)
    N, V, P = 3, 4, 128
    pst = jnp.asarray(load_pst(None, P))
    init_x = jnp.asarray(rng.uniform(-1, 1, (N, 6)).astype(np.float32))
    init_x = init_x.at[:, 3:].set(jnp.abs(init_x[:, 3:]) + 0.3)
    init_R = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (N, 1, 1))
    poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, None], (N, V, 1, 1))
    poses = poses.at[:, :, 2, 3].set(-4.0)
    corners = jnp.asarray(
        rng.uniform(100, 400, (N, V, 8, 2)).astype(np.float32)
    )
    vmask = jnp.ones((N, V), jnp.float32)
    active = jnp.array([True, True, False])
    K = jnp.asarray([[300.0, 0, 256], [0, 300.0, 192], [0, 0, 1]], jnp.float32)
    H = jnp.float32(384.0)
    W = jnp.float32(512.0)

    outs = {}
    for unroll in (False, True):
        cfg = PSTOptConfig(iters=8, fitness_impl="xla", unroll=unroll)
        fused, upd = optimize_boxes(
            init_x, init_R, pst, poses, corners, vmask, active, K, H, W, cfg
        )
        outs[unroll] = (np.asarray(fused), np.asarray(upd))

    np.testing.assert_array_equal(outs[False][1], outs[True][1])
    np.testing.assert_allclose(outs[False][0], outs[True][0], atol=1e-6, rtol=0)


def test_nms_budget_exhaustion_surfaces():
    """The unrolled engine's sweep/record chains are bounded by
    StepConfig.max_nms_sweeps/max_nms_records (compile-size independent of
    world capacity).  Starving the record budget on a contention-heavy load
    must SURFACE in stats (no-silent-caps), and the default budgets must
    never fire on the same load (their chains cover the scene, so decisions
    stay identical -- the parity tests above run under the defaults)."""
    seq = SyntheticSequence(n_frames=10, n_boxes=5, seed=2)

    def run_with(sweeps, records):
        cfg = _cfg("unrolled")
        cfg["association"]._data["max_nms_sweeps"] = sweeps
        cfg["association"]._data["max_nms_records"] = records
        pipe = DevicePipeline(
            cfg, OracleDetector(seq, noise=0.02, seed=3), capacity=48
        )
        world = pipe.run(seq, gap=5)
        return world["stats"]["nms_budget_exhausted"]

    assert run_with(64, 1) > 0        # starved record chain -> surfaced
    assert run_with(64, 256) == 0     # defaults cover the scene


def test_auto_engine_resolves_loops_on_cpu():
    from boxfusion_tpu.runtime.device_pipeline import resolve_engine, step_config_from

    cfg = _cfg("auto")
    assert resolve_engine(cfg) == "loops"
    sc = step_config_from(cfg)
    assert sc.engine == "loops" and not sc.opt.unroll

    cfg2 = _cfg("unrolled")
    sc2 = step_config_from(cfg2)
    assert sc2.engine == "unrolled" and sc2.opt.unroll

    with pytest.raises(ValueError):
        resolve_engine(_cfg("bogus"))

"""Fusion-ON behavioral parity: OUR PST optimizer vs the REFERENCE's.

test_reference_sequence_parity.py proves the association stack matches with
``box_fusion.use: False``; this module closes the last gap -- the PST fusion
optimizer itself (the system's namesake).  The reference's own host math is
imported from /root/reference and driven verbatim:

  * ``BoxFusion.boxfusion`` loop (box_fusion.py:622-724): eligibility,
    per-object iteration, EMA across consecutive successes, 3-fail stop,
    final dims clamp, write-back;
  * ``init_opt_params`` (box_fusion.py:566-600), ``init_searchsize``
    (468-473), ``cal_transform`` (475-535, first-200 contributor cap),
    ``update_PST`` (537-563);
  * the real shipped PST table (data/pst_1024_0.tiff, 1024x6, row 0 zero).

The ONE substituted piece is ``evaluate_iou``: the reference's is an inline
CUDA kernel (box_fusion.py:63-407) that cannot run here, so both sides score
particles with this repo's multi-view projected-IoU fitness
(fusion/kernel.py, itself Monte-Carlo-validated and Pallas-parity-tested).

What "parity" can and cannot mean here, measured (see the step-math test):

  * The STEP MAP is exactly equivalent: fed identical fitness arrays, the
    reference's cal_transform/update_PST/EMA/stop trajectory and ours agree
    to float32 epsilon (<=1e-6 over all 20 iterations).  This is the
    deterministic, assertable core -- test_step_math_parity.
  * The TRAJECTORY is chaotically sensitive to the last bits of the fitness
    values: contributor selection is a hard ``f < f0`` threshold over 1024
    particles, iterated ~20 times.  Re-running the REFERENCE loop with the
    same fitness math compiled into a different XLA program (padded views)
    already shifts its own fused boxes by ~6e-4; our engines evaluate the
    fitness inside a differently-fused jit (vmap over objects x while_loop)
    and land ~6e-3 away at an equally good optimum.  The reference's own
    CUDA kernel is nondeterministic at exactly this level (atomicAdd
    accumulation order varies per launch, box_fusion.py:400-401), so
    bit-trajectory parity is ill-defined even for the reference against
    itself.  End-to-end we therefore assert: identical association + fusion
    DECISIONS, fused coordinates within a measured chaos bound
    (FUSED_ATOL), and per-box fitness within FITNESS_GAP of the reference's
    optimum (both sides converged comparably).
"""
import importlib.machinery
import os
import sys
import types
from functools import partial

import numpy as np
import pytest

from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
from boxfusion_tpu.runtime import OnlinePipeline
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
from tests.test_reference_sequence_parity import _cfg, _reference_run

REF = "/root/reference"
REAL_PST = os.path.join(REF, "data", "pst_1024_0.tiff")
pytestmark = pytest.mark.skipif(
    not os.path.isfile(REAL_PST), reason="reference PST asset not mounted"
)

# Measured chaos scale (module docstring): single-object divergence ~6e-3,
# worst observed over the 400-frame sequence 5.5e-2.  Boxes are 0.2-1.5 m;
# every association threshold is >= 0.1 in its own unit.
FUSED_ATOL = 0.08
# Both sides must land on equally-good optima: per fused box, the
# multi-view fitness of our result within this of the reference's
# (measured typical gap 6e-3).
FITNESS_GAP = 0.03
# Non-fused boxes must still match at association-parity tightness.
EXACT_ATOL = 1e-5


def _install_pycuda_stub():
    """Importable no-op pycuda: the reference's box_fusion.py module body
    subclasses ``cuda.PointerHolderBase`` at import time (box_fusion.py:19),
    so the try/except around the import is not enough -- without a stub the
    module cannot even be imported on a CUDA-less machine."""
    if "pycuda" in sys.modules:
        return

    def _mod(name):
        m = types.ModuleType(name)
        # real ModuleSpec: transformers' optional-dependency probe walks
        # sys.modules and chokes on spec-less stubs (see
        # test_reference_parity._install_reference)
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        sys.modules[name] = m
        return m

    pycuda = _mod("pycuda")
    driver = _mod("pycuda.driver")

    class PointerHolderBase:
        pass

    driver.PointerHolderBase = PointerHolderBase
    autoctx = _mod("pycuda.autoprimaryctx")
    compiler = _mod("pycuda.compiler")

    def _no_source_module(*a, **k):
        raise RuntimeError("CUDA compilation is unavailable in the parity harness")

    compiler.SourceModule = _no_source_module
    gpuarray = _mod("pycuda.gpuarray")
    pycuda.driver = driver
    pycuda.autoprimaryctx = autoctx
    pycuda.compiler = compiler
    pycuda.gpuarray = gpuarray


def _fitness_fn(pst: np.ndarray):
    """A drop-in for the reference's ``evaluate_iou`` built on this repo's
    multi-view fitness (fusion/kernel.py::multiview_fitness).

    Matches the CUDA call contract (box_fusion.py:413-461): inputs are cast
    to float32 exactly as ``cuda.In(...astype(np.float32))`` does, and the
    return is the per-particle mean over views of |1 - projected IoU|
    (search_value / (search_count + 1e-6) with search_count == n_views).
    """
    import jax
    import jax.numpy as jnp

    from boxfusion_tpu.fusion.kernel import multiview_fitness

    pst_dev = jnp.asarray(pst, jnp.float32)

    @partial(jax.jit, static_argnames=("H", "W"))
    def fit(xyzlhw, R, ss, poses, corners, K3, H, W):
        vm = jnp.ones(poses.shape[0], jnp.float32)
        return multiview_fitness(
            xyzlhw, R, pst_dev, ss, poses, corners, vm, K3, H, W, impl="xla"
        )

    def evaluate(self, box_3d, corners_2d, box_rot, scores_box, camera_poses,
                 search_size, num_of_boxes, verbose=False):
        out = fit(
            np.asarray(box_3d, np.float32).reshape(6),
            np.asarray(box_rot, np.float32).reshape(3, 3),
            np.asarray(search_size, np.float32).reshape(6),
            np.asarray(camera_poses, np.float32).reshape(-1, 4, 4),
            np.asarray(corners_2d, np.float32).reshape(-1, 8, 2),
            np.asarray(self.K[:3, :3], np.float32),
            float(self.H),
            float(self.W),
        )
        return np.asarray(out)

    return evaluate


def _make_ref_fuser(cfg, pst: np.ndarray, K3: np.ndarray, h: int, w: int):
    """A reference ``BoxFusion`` with every host method real and only the
    CUDA ``evaluate_iou`` substituted (constructed via __new__ because
    __init__ compiles the CUDA kernel, box_fusion.py:63-409)."""
    _install_pycuda_stub()
    from tests.test_reference_parity import _install_reference

    _install_reference()
    from boxfusion.box_fusion import BoxFusion

    f = BoxFusion.__new__(BoxFusion)
    f.cfg = None
    f.PST = np.ascontiguousarray(np.asarray(pst, np.float32))
    f.K = np.eye(4, dtype=np.float64)
    f.K[:3, :3] = K3
    f.H = int(h)
    f.W = int(w)
    f.update_K_flag = False
    bf = cfg["box_fusion"]
    ro = bf["random_opt"]
    f.fusion_iters = int(bf["iters"])
    f.pst_size = f.PST.shape[0]
    f.center_init_size = float(ro["center_init_size"])
    f.center_scaling_coefficient = float(ro["center_scaling_coefficient"])
    f.shape_init_size = float(ro["shape_init_size"])
    f.shape_scaling_coefficient = float(ro["shape_scaling_coefficient"])
    f.evaluate_iou = types.MethodType(_fitness_fn(f.PST), f)
    return f


def _fused_cfg():
    c = _cfg()
    c["box_fusion"]._data["use"] = True
    c["box_fusion"]._data["pst_path"] = REAL_PST
    c["box_fusion"]._data["pst_size"] = 1024
    return c


def _load_pst():
    from boxfusion_tpu.fusion.pst import load_pst

    return np.asarray(load_pst(REAL_PST, 1024))


def _object_views(seq, frames, det, obj: int, frame_ids):
    """Gather one synthetic object's multi-view observation set (world boxes,
    poses, projected corners) -- the inputs boxfusion() hands the optimizer."""
    from boxfusion_tpu.geometry.boxes import CORNER_SIGNS

    box3d, Rs, scores, poses, corners2d = [], [], [], [], []
    for i in frame_ids:
        f = frames[i]
        d = det(f)
        P = f.gt_pose
        Rp, t = P[:3, :3], P[:3, 3]
        cw = d["boxes3d"][:, :3] @ Rp.T + t
        j = int(np.argmin(np.linalg.norm(cw - seq.gt_xyzlhw[obj, :3], axis=1)))
        x = np.concatenate([cw[j], d["boxes3d"][j, 3:]]).astype(np.float32)
        R_w = (Rp @ d["R"][j]).astype(np.float32)
        half = x[3:] * 0.5
        local = CORNER_SIGNS * half[None]
        corners = local @ R_w.T + x[:3]
        pinv = np.linalg.inv(P)
        ch = corners @ pinv[:3, :3].T + pinv[:3, 3]
        K = f.K_depth
        h, w = f.image.shape[:2]
        u = np.clip(K[0, 0] * ch[:, 0] / ch[:, 2] + K[0, 2], 0, w)
        v = np.clip(K[1, 1] * ch[:, 1] / ch[:, 2] + K[1, 2], 0, h)
        box3d.append(x)
        Rs.append(R_w)
        scores.append(d["scores"][j])
        poses.append(P.astype(np.float32))
        corners2d.append(np.stack([u, v], -1).astype(np.float32))
    return (
        np.stack(box3d), np.stack(Rs), np.asarray(scores, np.float32),
        np.stack(poses), np.stack(corners2d),
    )


def test_step_math_parity():
    """Fed IDENTICAL fitness arrays, our jitted step math (_cal_transform,
    _update_search_size, EMA, fail-stop) and the reference's host loop
    (cal_transform/update_PST, box_fusion.py:664-714) produce the same
    trajectory to float32 epsilon -- the deterministic core of optimizer
    parity, immune to the chaotic fitness sensitivity described in the
    module docstring."""
    import jax
    import jax.numpy as jnp

    from boxfusion_tpu.fusion.optimizer import (
        PSTOptConfig,
        _cal_transform,
        _update_search_size,
    )

    pst = _load_pst()
    cfg = _fused_cfg()
    seq = SyntheticSequence(n_frames=400, n_boxes=8, image_hw=(192, 256), seed=0)
    frames = list(seq)
    det = OracleDetector(seq, noise=0.03, seed=1)
    ocfg = PSTOptConfig()

    calt = jax.jit(lambda f, ss: _cal_transform(f, jnp.asarray(pst), ss, 200))
    upds = jax.jit(lambda iou, mt: _update_search_size(iou, mt, ocfg))

    for obj in (0, 3):
        box3d, Rs, scores, poses, corners2d = _object_views(
            seq, frames, det, obj, (0, 20, 40, 60)
        )
        fz = _make_ref_fuser(cfg, pst, frames[0].K_depth, 192, 256)
        gx_ref, rot = fz.init_opt_params(box3d.astype(np.float64), Rs, scores)
        fz.init_searchsize()
        prev_succ_ref, fail_ref = False, 0

        gx = gx_ref.astype(np.float32).copy()
        ss = np.array([0.1] * 3 + [0.5] * 3, np.float32)
        prev_ss = np.zeros(6, np.float32)
        prev_succ, fail = False, 0

        steps = 0
        for _ in range(fz.fusion_iters):
            # one shared fitness evaluation (at the reference's state; both
            # states track to float eps, which is exactly the assertion)
            sv = fz.evaluate_iou(
                gx_ref, corners2d, rot, scores, poses, fz.search_size, len(scores)
            )
            s_ref, iou_ref, mt_ref = fz.cal_transform(sv, fz.search_size)
            fz.update_PST(
                iou_ref, mt_ref,
                center_scale=fz.center_scaling_coefficient,
                shape_scale=fz.shape_scaling_coefficient,
            )
            if prev_succ_ref and s_ref:
                fz.search_size = 0.9 * fz.search_size + 0.1 * fz.previous_search_size
            if s_ref:
                prev_succ_ref, fail_ref = True, 0
                gx_ref = gx_ref + mt_ref
                fz.previous_search_size = fz.search_size.copy()
            else:
                fail_ref += 1
                prev_succ_ref = False

            s, iou, mt = calt(jnp.asarray(sv), jnp.asarray(ss))
            s = bool(s)
            mt = np.asarray(mt)
            new_ss = np.asarray(upds(jnp.float32(iou), jnp.asarray(mt)))
            if prev_succ and s:
                new_ss = ocfg.beta * new_ss + (1.0 - ocfg.beta) * prev_ss
            if s:
                gx = gx + mt
                prev_ss = new_ss.copy()
                prev_succ, fail = True, 0
            else:
                fail += 1
                prev_succ = False
            ss = new_ss

            assert s == bool(s_ref)
            np.testing.assert_allclose(mt, mt_ref, atol=1e-6)
            np.testing.assert_allclose(ss, fz.search_size, atol=1e-6)
            np.testing.assert_allclose(float(iou), float(iou_ref), atol=1e-6)
            steps += 1
            if fail_ref >= 3:
                assert fail >= 3
                break
        assert steps >= 4  # the scenario exercised a real trajectory
        np.testing.assert_allclose(gx, gx_ref, atol=1e-5)


@pytest.fixture(scope="module")
def fused_runs():
    cfg = _fused_cfg()
    gap = 20
    seq = SyntheticSequence(n_frames=400, n_boxes=8, image_hw=(192, 256), seed=0)
    frames = list(seq)
    pst = _load_pst()

    ref = _reference_run(
        frames,
        OracleDetector(seq, noise=0.03, seed=1),
        cfg,
        gap,
        fuser_factory=lambda K3, h, w: _make_ref_fuser(cfg, pst, K3, h, w),
    )

    host = OnlinePipeline(cfg, OracleDetector(seq, noise=0.03, seed=1))
    host_world = host.run(frames, gap=gap)

    dev = DevicePipeline(cfg, OracleDetector(seq, noise=0.03, seed=1), capacity=64)
    dev_world = dev.run(frames, gap=gap)
    return ref, host, host_world, dev_world


def test_fusion_actually_ran(fused_runs):
    """The scenario exercises the optimizer: some boxes were PST-fused and
    the fusion history is non-trivial."""
    ref, host, host_world, dev_world = fused_runs
    assert len(ref["already_fusion"]) >= 3
    assert any(len(v) >= 3 for v in ref["fusion_lists"].values())
    assert sum(host.manager.fusion_flag) >= 1
    assert dev_world["fusion_flag"].sum() >= 1


def _split_compare(ref, ids_ours, xyz_ours, valid_ours, fused_mask_by_init):
    np.testing.assert_array_equal(np.sort(ref["init_id"]), np.sort(ids_ours))
    o_r = np.argsort(ref["init_id"])
    o_o = np.argsort(ids_ours)
    fused = np.asarray(
        [fused_mask_by_init[int(i)] for i in np.sort(ids_ours)], bool
    )
    ref_x = ref["xyzlhw"][o_r]
    our_x = xyz_ours[o_o]
    # non-fused boxes: association-parity tight
    np.testing.assert_allclose(ref_x[~fused], our_x[~fused], atol=EXACT_ATOL)
    # fused boxes: within the measured chaos bound
    np.testing.assert_allclose(ref_x[fused], our_x[fused], atol=FUSED_ATOL)
    np.testing.assert_array_equal(ref["valid_num"][o_r], valid_ours[o_o])


def test_reference_vs_host_fused_boxes(fused_runs):
    ref, host, host_world, _ = fused_runs
    flags = {
        int(i): bool(f)
        for i, f in zip(host_world.arrays["init_id"], host.manager.fusion_flag)
    }
    _split_compare(
        ref,
        host_world.arrays["init_id"],
        host_world.arrays["xyzlhw"],
        host_world.arrays["valid_num"],
        flags,
    )


def test_reference_vs_host_fusion_decisions(fused_runs):
    """Same fusion lists AND the same history of fused member sets."""
    ref, host, host_world, _ = fused_runs
    ours = {
        int(i): sorted(int(x) for x in fl)
        for i, fl in zip(host_world.arrays["init_id"], host.manager.fusion_list)
    }
    assert ours == ref["fusion_lists"]
    ours_hist = sorted(
        tuple(sorted(int(x) for x in fl)) for fl in host.manager.already_fusion
    )
    assert ours_hist == ref["already_fusion"]


def test_reference_vs_host_fitness_gap(fused_runs):
    """Both optimizers converged to equally good optima: per fused box, the
    multi-view fitness (mean |1 - projected IoU| over its CURRENT member
    views) of our fused parameters is within FITNESS_GAP of the
    reference's."""
    import jax.numpy as jnp

    from boxfusion_tpu.fusion.kernel import multiview_fitness

    ref, host, host_world, _ = fused_runs
    ref_by_id = dict(zip(ref["init_id"], ref["xyzlhw"]))
    K3 = jnp.asarray(SyntheticSequence(image_hw=(192, 256)).K)
    identity = jnp.zeros((1, 6), jnp.float32)

    def fit_at(x, R, poses, corners):
        out = multiview_fitness(
            jnp.asarray(x, jnp.float32), jnp.asarray(R), identity,
            jnp.zeros(6, jnp.float32), jnp.asarray(poses), jnp.asarray(corners),
            jnp.ones(poses.shape[0], jnp.float32), K3,
            jnp.float32(192.0), jnp.float32(256.0), impl="xla",
        )
        return float(out[0])

    checked = 0
    for i, flag in enumerate(host.manager.fusion_flag):
        if not flag:
            continue
        members = host.manager.fusion_list[i]
        poses = host.obs.cam_pose[members]
        corners = host.obs.corners2d[members]
        R = host_world.arrays["R"][i]
        f_ours = fit_at(host_world.arrays["xyzlhw"][i], R, poses, corners)
        f_ref = fit_at(
            ref_by_id[int(host_world.arrays["init_id"][i])], R, poses, corners
        )
        assert abs(f_ours - f_ref) <= FITNESS_GAP, (
            f"box {i}: fitness ours={f_ours:.4f} ref={f_ref:.4f}"
        )
        checked += 1
    assert checked >= 1


def test_reference_vs_device_fused_boxes(fused_runs):
    ref, host, _, dev_world = fused_runs
    flags = {
        int(i): bool(f)
        for i, f in zip(dev_world["init_id"], dev_world["fusion_flag"])
    }
    _split_compare(
        ref,
        dev_world["init_id"],
        dev_world["xyzlhw"],
        dev_world["valid_num"],
        flags,
    )


def test_reference_vs_device_fusion_lists(fused_runs):
    ref, _, _, dev_world = fused_runs
    ours = {
        int(i): sorted(int(x) for x in fl)
        for i, fl in zip(dev_world["init_id"], dev_world["fusion_list"])
    }
    assert ours == ref["fusion_lists"]


def test_host_vs_device_fusion_flags(fused_runs):
    """Engine-vs-engine: both compact fusion_flag with the world set (the
    documented deviation from the reference's stale-index flags), so they
    must agree exactly."""
    _, host, host_world, dev_world = fused_runs
    o_h = np.argsort(host_world.arrays["init_id"])
    o_d = np.argsort(dev_world["init_id"])
    host_flags = np.asarray(host.manager.fusion_flag)[o_h]
    np.testing.assert_array_equal(host_flags, dev_world["fusion_flag"][o_d])

"""Ablate the device keyframe step at the 100-det stress load.

Replays identical detector outputs through keyframe_step_devdet with parts
of the step disabled to attribute the per-keyframe device time.
Run from the repo root (PYTHONPATH must include it) on the target backend.
"""
import time

import jax
import numpy as np

from boxfusion_tpu.data.preprocess import Preprocessor
from boxfusion_tpu.data.synthetic import SyntheticSequence
from boxfusion_tpu.models.cutr import make_cutr
from boxfusion_tpu.runtime.detector import CuTRDetector
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
from boxfusion_tpu.runtime.device_step import META_WIDTH
from boxfusion_tpu.utils.config import load_config

on_tpu = jax.default_backend() not in ("cpu",)
dim = 768 if on_tpu else 192
S = 512 if on_tpu else 256
gap, n_frames = 20, 200

seq = SyntheticSequence(n_frames=n_frames, n_boxes=8, image_hw=(int(0.75 * S), S), seed=0)
frames = list(seq)
kf = [fr for i, fr in enumerate(frames) if i % gap == 0]

model = make_cutr(dimension=dim, depth_model=True, dtype="bfloat16" if on_tpu else "float32")
pre = Preprocessor()
batch0, _, _ = pre(kf[0].image, kf[0].depth, kf[0].K, kf[0].T_gravity)
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch0)
detector = CuTRDetector(model, params, device_output=True)
dets = [detector(fr) for fr in kf]
jax.block_until_ready(dets[-1]["scores"])


def base_cfg():
    cfg = load_config("config/ca1m.yaml")
    cfg["data"]._data["gap"] = gap
    cfg["detection"]._data["score_thresh"] = 0.0
    cfg["detection"]._data["uv_bound"] = False
    cfg["detection"]._data["floor_mask"] = False
    cfg["detection"]._data["size_max_thres"] = None
    cfg["box_fusion"]._data["pst_path"] = None
    return cfg


def run(tag, cfg):
    def once():
        pipe = DevicePipeline(cfg, lambda fr: None, capacity=512)
        t0 = time.perf_counter()
        for frame, det in zip(kf, dets):
            d = {k: v for k, v in det.items()
                 if k in ("scores", "pred_boxes", "boxes3d", "R", "proj_xy")}
            h, w = frame.image.shape[:2]
            meta = np.empty(META_WIDTH, np.float32)
            meta[:16] = np.asarray(frame.gt_pose, np.float32).ravel()
            meta[16:25] = np.asarray(frame.K, np.float32).ravel()
            meta[25:34] = np.asarray(frame.K_depth, np.float32).ravel()
            meta[34:36] = (float(h), float(w))
            meta[36] = float(frame.timestamp)
            pipe._device_step_dev(d, meta, int(cfg["detection"]["max_detections"]))
        jax.block_until_ready(pipe.state.n)
        n_final = int(pipe.state.n)
        return time.perf_counter() - t0, n_final

    once()  # compile + warm
    ts = [once() for _ in range(3)]
    dt = float(np.median([t for t, _ in ts]))
    print(f"{tag:<38} {dt/len(kf)*1000:7.2f} ms/kf   (final n={ts[-1][1]})", flush=True)


cfg = base_cfg()
run("full step (fusion+corr+nms)", cfg)

cfg = base_cfg()
cfg["box_fusion"]._data["use"] = False
run("fusion OFF", cfg)

cfg = base_cfg()
cfg["association"]._data["small_threshold"] = -1.0  # corr never fires
cfg["box_fusion"]._data["use"] = False
run("fusion+corr OFF (nms only)", cfg)

cfg = base_cfg()
cfg["box_fusion"]._data["nms_threshold"] = 2.0  # nothing suppressed
cfg["box_fusion"]._data["use"] = False
run("no suppression (append+iou only)", cfg)

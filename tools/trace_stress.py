"""jax.profiler device trace of keyframe_step_devdet at the 100-det load.

Replays recorded detector outputs; prints top-30 aggregated op durations.
Run from the repo root (PYTHONPATH incl.) on the target backend.
"""
import glob
import gzip
import json
from collections import defaultdict

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

cfg = load_config("config/ca1m.yaml")
cfg["data"]._data["gap"] = gap
cfg["detection"]._data["score_thresh"] = 0.0
cfg["detection"]._data["uv_bound"] = False
cfg["detection"]._data["floor_mask"] = False
cfg["detection"]._data["size_max_thres"] = None
cfg["box_fusion"]._data["pst_path"] = None


def run_once(pipe):
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


run_once(DevicePipeline(cfg, lambda fr: None, capacity=512))  # compile
pipe = DevicePipeline(cfg, lambda fr: None, capacity=512)
with jax.profiler.trace("/tmp/stress_trace"):
    run_once(pipe)

paths = glob.glob("/tmp/stress_trace/**/*.trace.json.gz", recursive=True)
paths.sort(key=lambda p: -len(p))
with gzip.open(paths[-1], "rt") as f:
    data = json.load(f)

events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
agg = defaultdict(float)
cnt = defaultdict(int)
for e in events:
    name = e.get("name", "")
    agg[name] += e.get("dur", 0) / 1e3
    cnt[name] += 1
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{ms:9.2f} ms  x{cnt[name]:<6} {name[:110]}")

"""Stage breakdown of the device-resident REAL-detector path under load.

Real CuTR-768 (random weights, bf16 on TPU) with device_output=True feeding
DevicePipeline: 100 top-k detections enter association+fusion every
keyframe (score_thresh 0 keeps all of them -- the stress load from
README.md).  Prints per-stage wall-clock so the next optimization target is
obvious.

Run from the repo root on the target backend:
    python tools/profile_stress.py
"""
import time

import jax
import numpy as np

from boxfusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from boxfusion_tpu.data.synthetic import SyntheticSequence
from boxfusion_tpu.models.cutr import make_cutr
from boxfusion_tpu.runtime.detector import CuTRDetector
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
from boxfusion_tpu.utils.config import load_config

on_tpu = jax.default_backend() not in ("cpu",)
dim = 768 if on_tpu else 192
S, r = (512, 1) if on_tpu else (256, 4)
gap, n_frames = 20, 200

seq = SyntheticSequence(n_frames=n_frames, n_boxes=8, image_hw=(int(0.75 * S), S), seed=0)
frames = list(seq)
kf = [fr for i, fr in enumerate(frames) if i % gap == 0]

model = make_cutr(dimension=dim, depth_model=True, dtype="bfloat16" if on_tpu else "float32")
det0 = CuTRDetector.__new__(CuTRDetector)  # init params via a real batch below
from boxfusion_tpu.data.preprocess import Preprocessor

pre = Preprocessor()
batch0, _, _ = pre(kf[0].image, kf[0].depth, kf[0].K, kf[0].T_gravity)
print("compiling model.init...", flush=True)
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch0)
print("init done", flush=True)
detector = CuTRDetector(model, params, device_output=True)

cfg = load_config("config/ca1m.yaml")
cfg["data"]._data["gap"] = gap
cfg["detection"]._data["score_thresh"] = 0.0  # keep all 100 top-k rows
cfg["detection"]._data["uv_bound"] = False
cfg["detection"]._data["floor_mask"] = False
cfg["detection"]._data["size_max_thres"] = None
cfg["box_fusion"]._data["pst_path"] = None


def run_pipe():
    pipe = DevicePipeline(cfg, detector, capacity=512)
    t0 = time.perf_counter()
    for i, frame in enumerate(frames):
        if i % gap == 0:
            pipe.process_keyframe(frame)
        pipe.count += 1
    pipe.flush()
    jax.block_until_ready(pipe.state.n)
    return time.perf_counter() - t0


print("compiling pipeline...", flush=True)
run_pipe()  # compile + warm
print("pipeline warm", flush=True)
times = [run_pipe() for _ in range(3)]
dt = float(np.median(times))
print(f"e2e (real CuTR, device-resident, 100 det/kf): {n_frames/dt:8.1f} FPS "
      f"({dt/len(kf)*1000:.2f} ms/keyframe)")

# --- stage: preprocess (host) -----------------------------------------------
t0 = time.perf_counter()
for frame in kf:
    pre(frame.image, frame.depth, frame.K, frame.T_gravity)
print(f"preprocess (host+upload):   {(time.perf_counter()-t0)/len(kf)*1000:7.2f} ms/kf")

# --- stage: detector forward -------------------------------------------------
for frame in kf[:2]:
    jax.block_until_ready(detector(frame)["scores"])
t0 = time.perf_counter()
for frame in kf:
    out = detector(frame)
jax.block_until_ready(out["scores"])
print(f"detector (pre+fwd, jitted): {(time.perf_counter()-t0)/len(kf)*1000:7.2f} ms/kf")

# --- stage: keyframe step only (replay identical detections) ----------------
pipe = DevicePipeline(cfg, detector, capacity=512)
dets = [detector(fr) for fr in kf]
jax.block_until_ready(dets[-1]["scores"])


def step_only():
    pipe2 = DevicePipeline(cfg, lambda fr: None, capacity=512)
    t0 = time.perf_counter()
    for frame, det in zip(kf, dets):
        d = {k: v for k, v in det.items()
             if k in ("scores", "pred_boxes", "boxes3d", "R", "proj_xy")}
        h, w = frame.image.shape[:2]
        from boxfusion_tpu.runtime.device_step import META_WIDTH
        meta = np.empty(META_WIDTH, np.float32)
        meta[:16] = np.asarray(frame.gt_pose, np.float32).ravel()
        meta[16:25] = np.asarray(frame.K, np.float32).ravel()
        meta[25:34] = np.asarray(frame.K_depth, np.float32).ravel()
        meta[34:36] = (float(h), float(w))
        meta[36] = float(frame.timestamp)
        pipe2._device_step_dev(d, meta, int(cfg["detection"]["max_detections"]))
    jax.block_until_ready(pipe2.state.n)
    return time.perf_counter() - t0


step_only()  # warm
ts = [step_only() for _ in range(3)]
print(f"keyframe step (assoc+fuse): {float(np.median(ts))/len(kf)*1000:7.2f} ms/kf")

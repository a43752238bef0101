"""Bisect what a DevicePipeline run leaves behind that slows detector calls."""
import time

import jax
import numpy as np

from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from boxfusion_tpu.data.preprocess import Preprocessor
from boxfusion_tpu.data.synthetic import SyntheticSequence
from boxfusion_tpu.models.cutr import make_cutr
from boxfusion_tpu.runtime.detector import CuTRDetector
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
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

cfg = load_config("config/ca1m.yaml")
cfg["data"]._data["gap"] = gap
cfg["detection"]._data["score_thresh"] = 0.0
cfg["detection"]._data["uv_bound"] = False
cfg["detection"]._data["floor_mask"] = False
cfg["detection"]._data["size_max_thres"] = None
cfg["box_fusion"]._data["pst_path"] = None


def det_stage(tag):
    for frame in kf[:2]:
        jax.block_until_ready(detector(frame)["scores"])
    t0 = time.perf_counter()
    for frame in kf:
        out = detector(frame)
    jax.block_until_ready(out["scores"])
    print(f"detector [{tag}]: {(time.perf_counter()-t0)/len(kf)*1000:7.2f} ms/kf", flush=True)


det_stage("baseline")

pipe = DevicePipeline(cfg, detector, capacity=512)
det_stage("after construct only")

for i, frame in enumerate(frames[:40]):
    if i % gap == 0:
        pipe.process_keyframe(frame)
    pipe.count += 1
pipe.flush()
jax.block_until_ready(pipe.state.n)
det_stage("after 2 keyframes")

pipe._executor.shutdown(wait=True)
det_stage("after executor shutdown")

del pipe
det_stage("after del pipe")

"""Which layer degrades after keyframe_step runs: transfer, dispatch, or compute?"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from boxfusion_tpu.data.preprocess import Preprocessor
from boxfusion_tpu.data.synthetic import SyntheticSequence
from boxfusion_tpu.models.cutr import make_cutr
from boxfusion_tpu.runtime.detector import CuTRDetector
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline, step_config_from
from boxfusion_tpu.runtime.device_state import init_state
from boxfusion_tpu.runtime.device_step import META_WIDTH, keyframe_step_devdet
from boxfusion_tpu.utils.config import load_config

on_tpu = jax.default_backend() not in ("cpu",)
dim = 768 if on_tpu else 192
S = 512 if on_tpu else 256

seq = SyntheticSequence(n_frames=40, n_boxes=8, image_hw=(int(0.75 * S), S), seed=0)
frames = list(seq)
kf = [frames[0], frames[20]]

model = make_cutr(dimension=dim, depth_model=True, dtype="bfloat16" if on_tpu else "float32")
pre = Preprocessor()
batch0, _, _ = pre(kf[0].image, kf[0].depth, kf[0].K, kf[0].T_gravity)
import sys
sys.stdout = open("/tmp/probe_out.txt", "w", buffering=1)
print("init...", flush=True)
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch0)
print("init done", flush=True)
detector = CuTRDetector(model, params, device_output=True)

N = 10


def stages(tag):
    out = detector(kf[0])
    jax.block_until_ready(out["scores"])
    t0 = time.perf_counter()
    for _ in range(N):
        out = detector(kf[0])
    jax.block_until_ready(out["scores"])
    full = (time.perf_counter() - t0) / N * 1000

    img_d, dep_d, K_d, Tg_d = jax.device_put(
        (kf[0].image, np.asarray(kf[0].depth, np.float32),
         np.asarray(kf[0].K, np.float32), np.asarray(kf[0].T_gravity, np.float32)))
    fn = detector._fused_fn(S, 1)
    out = fn(params, img_d, dep_d, K_d, Tg_d)
    jax.block_until_ready(out["scores"])
    t0 = time.perf_counter()
    for _ in range(N):
        out = fn(params, img_d, dep_d, K_d, Tg_d)
    jax.block_until_ready(out["scores"])
    resident = (time.perf_counter() - t0) / N * 1000

    t0 = time.perf_counter()
    for _ in range(N):
        r = jax.device_put(
            (kf[0].image, np.asarray(kf[0].depth, np.float32),
             np.asarray(kf[0].K, np.float32), np.asarray(kf[0].T_gravity, np.float32)))
    jax.block_until_ready(r)
    put = (time.perf_counter() - t0) / N * 1000

    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    jax.block_until_ready(tiny(x))
    t0 = time.perf_counter()
    for _ in range(N):
        x2 = tiny(x)
    jax.block_until_ready(x2)
    tiny_ms = (time.perf_counter() - t0) / N * 1000

    print(f"[{tag}] detector={full:7.2f}  resident_fn={resident:7.2f}  "
          f"device_put={put:7.2f}  tiny_jit={tiny_ms:7.2f}  (ms/call)", flush=True)


stages("baseline")

cfg = load_config("config/ca1m.yaml")
cfg["detection"]._data["score_thresh"] = 0.0
cfg["detection"]._data["uv_bound"] = False
cfg["detection"]._data["floor_mask"] = False
cfg["detection"]._data["size_max_thres"] = None
cfg["box_fusion"]._data["pst_path"] = None
scfg = step_config_from(cfg)
state = init_state(capacity=512, max_views=int(cfg["association"]["max_views"]),
                   obs_capacity=int(cfg["association"]["max_observations"]))
from boxfusion_tpu.fusion import load_pst
pst = jnp.asarray(load_pst(None, int(cfg["box_fusion"]["pst_size"])))

for i, frame in enumerate(kf):
    det = detector(frame)
    d = {k: v for k, v in det.items()
         if k in ("scores", "pred_boxes", "boxes3d", "R", "proj_xy")}
    h, w = frame.image.shape[:2]
    meta = np.empty(META_WIDTH, np.float32)
    meta[:16] = np.asarray(frame.gt_pose, np.float32).ravel()
    meta[16:25] = np.asarray(frame.K, np.float32).ravel()
    meta[25:34] = np.asarray(frame.K_depth, np.float32).ravel()
    meta[34:36] = (float(h), float(w))
    meta[36] = float(i * 20)
    state = keyframe_step_devdet(state, d, jax.device_put(meta), pst, scfg, 100)
jax.block_until_ready(state.n)

stages("after 2 direct keyframe_step_devdet")



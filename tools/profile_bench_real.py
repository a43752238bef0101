"""Dissect the bench real path: where do the per-keyframe milliseconds go?

Replicates bench.py's real-path setup exactly (CuTR-768 bf16 + CLIP ViT-L
labeler + FusedDevicePipeline capacity 256, synthetic 400-frame stream,
gap 20) and times each keyframe's host pack, upload+dispatch, and a
per-keyframe device sync, then the fully-pipelined run like the bench.
"""
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from boxfusion_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from boxfusion_tpu.data.synthetic import SyntheticSequence  # noqa: E402
from boxfusion_tpu.models.clip.head import OpenVocabLabeler  # noqa: E402
from boxfusion_tpu.models.clip.model import CLIPConfig  # noqa: E402
from boxfusion_tpu.models.cutr import FrameBatch, make_cutr  # noqa: E402
from boxfusion_tpu.runtime.detector import CuTRDetector  # noqa: E402
from boxfusion_tpu.runtime.fused import FusedDevicePipeline  # noqa: E402
from boxfusion_tpu.utils.config import load_config  # noqa: E402

S, r, dim, gap = 512, 1, 768, 20
model = make_cutr(dimension=dim, depth_model=True, dtype="bfloat16")
rng = np.random.RandomState(0)
f = 0.6 * S
batch = FrameBatch(
    image=jnp.asarray(rng.randn(1, S, S, 3), jnp.float32),
    depth=jnp.asarray(rng.randn(1, S // r, S // r, 1), jnp.float32),
    K=jnp.asarray([[[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]]], jnp.float32),
    image_hw=jnp.asarray([[0.75 * S, S]], jnp.float32),
    depth_params=jnp.asarray([[2.0, 0.5]], jnp.float32),
    T_gravity=jnp.eye(3, dtype=jnp.float32)[None],
)
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)


# same class-head bias calibration as bench.py: ~40-100 detections/keyframe
# pass the raw 0.3 score filter (random init passes zero)
def _lift_bias(path, leaf):
    keys = [getattr(p, "key", "") for p in path]
    if any("class_predictor" in k for k in keys) and keys[-1] == "bias":
        return leaf + 3.2
    return leaf


params = jax.tree_util.tree_map_with_path(_lift_bias, params)

seq = SyntheticSequence(n_frames=400, n_boxes=8, image_hw=(int(0.75 * S), S), seed=0)
frames = list(seq)

cfg = load_config("config/ca1m.yaml")
cfg["data"]._data["gap"] = gap
cfg["detection"]._data["score_thresh"] = 0.3
cfg["detection"]._data["uv_bound"] = False
cfg["detection"]._data["floor_mask"] = False
cfg["box_fusion"]._data["pst_path"] = None

clip_cfg = CLIPConfig(
    patch=14, width=1024, layers=24, heads=16, embed_dim=1024, dtype=jnp.bfloat16
)
tf = np.random.RandomState(1).randn(473, 1024).astype(np.float32)
labeler = OpenVocabLabeler([f"c{i}" for i in range(473)], tf, cfg=clip_cfg).init_random(0)

pipe = FusedDevicePipeline(cfg, CuTRDetector(model, params), labeler=labeler, capacity=256)

print("engine:", pipe.step_cfg.engine, flush=True)

# warmup (compile via persistent cache)
for i, fr in enumerate(frames[: 2 * gap + 1]):
    if i % gap == 0:
        pipe.process_keyframe(fr)
    pipe.count += 1
pipe.flush()
jax.block_until_ready(pipe.state.n)

# --- per-keyframe, SYNC after each (attributes device time + upload) -------
pipe.reset()
kf = [fr for i, fr in enumerate(frames) if i % gap == 0]
print(f"{len(kf)} keyframes", flush=True)
rows = []
for n, fr in enumerate(kf):
    t0 = time.perf_counter()
    buf = pipe._pack_buffer(fr)
    t1 = time.perf_counter()
    key = (fr.image.shape[0], fr.image.shape[1], fr.depth.shape[0], fr.depth.shape[1],
           *__import__("boxfusion_tpu.data.preprocess", fromlist=["resolve_pad_and_ratio"]
                        ).resolve_pad_and_ratio(fr.image, fr.depth, pipe.detector.buckets))
    fn = pipe._get_fused(key)
    t2 = time.perf_counter()
    pipe._fused_step(fn, buf)
    t3 = time.perf_counter()
    jax.block_until_ready(pipe.state.n)
    t4 = time.perf_counter()
    pipe.count += gap
    rows.append((t1 - t0, t2 - t1, t3 - t2, t4 - t3))
rows = np.array(rows) * 1e3
print("per-keyframe ms  [pack, get_fn, upload+dispatch, device-sync]:", flush=True)
print("  first:", np.round(rows[0], 2))
print("  kf 1-4:", np.round(rows[1:5], 2))
print("  median:", np.round(np.median(rows, axis=0), 2))
print("  max   :", np.round(np.max(rows, axis=0), 2))
print("  total per kf (median):", round(float(np.median(rows.sum(axis=1))), 2))

# --- pipelined run exactly like the bench ----------------------------------
# export=False: a world export D2H between runs would re-poison the tunnel
for _ in range(3):
    pipe.reset()
    pipe.run(frames, gap=gap, export=False)

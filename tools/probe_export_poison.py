"""Bisect: which end-of-run host interaction re-degrades the tunnel?

The unrolled engine removed every while_loop, yet bench real-path runs
after the FIRST one drop 20x (5280 -> 255 FPS).  Candidates between run 1
and run 2: int(label_overflow) scalar D2H, export_world bulk D2H, reset()'s
init_state uploads.  This probe measures device_put latency (the poison
symptom) after each interaction, in a fresh process.
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
from boxfusion_tpu.runtime.device_state import export_world  # noqa: E402
from boxfusion_tpu.runtime.fused import FusedDevicePipeline  # noqa: E402
from boxfusion_tpu.utils.config import load_config  # noqa: E402

img = np.random.randint(0, 255, (384, 512, 3), np.uint8)
dep = np.random.rand(384, 512).astype(np.float32)


def put_ms(tag):
    for _ in range(3):
        r = jax.device_put((img, dep))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(15):
        r = jax.device_put((img, dep))
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / 15 * 1000
    print(f"put after {tag:28s}: {ms:7.2f} ms", flush=True)
    return ms


S, gap = 512, 20
model = make_cutr(dimension=768, depth_model=True, dtype="bfloat16")
rng = np.random.RandomState(0)
f = 0.6 * S
batch = FrameBatch(
    image=jnp.asarray(rng.randn(1, S, S, 3), jnp.float32),
    depth=jnp.asarray(rng.randn(1, S, S, 1), jnp.float32),
    K=jnp.asarray([[[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]]], jnp.float32),
    image_hw=jnp.asarray([[0.75 * S, S]], jnp.float32),
    depth_params=jnp.asarray([[2.0, 0.5]], jnp.float32),
    T_gravity=jnp.eye(3, dtype=jnp.float32)[None],
)
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
seq = SyntheticSequence(n_frames=400, n_boxes=8, image_hw=(int(0.75 * S), S), seed=0)
frames = list(seq)
cfg = load_config("config/ca1m.yaml")
cfg["data"]._data["gap"] = gap
cfg["detection"]._data["score_thresh"] = 0.3
cfg["detection"]._data["uv_bound"] = False
cfg["detection"]._data["floor_mask"] = False
cfg["box_fusion"]._data["pst_path"] = None
clip_cfg = CLIPConfig(patch=14, width=1024, layers=24, heads=16, embed_dim=1024,
                      dtype=jnp.bfloat16)
tf = np.random.RandomState(1).randn(473, 1024).astype(np.float32)
labeler = OpenVocabLabeler([f"c{i}" for i in range(473)], tf, cfg=clip_cfg).init_random(0)
pipe = FusedDevicePipeline(cfg, CuTRDetector(model, params), labeler=labeler, capacity=256)

put_ms("imports+pipeline build")

# warmup
for i, fr in enumerate(frames[: 2 * gap + 1]):
    if i % gap == 0:
        pipe.process_keyframe(fr)
    pipe.count += 1
pipe.flush()
jax.block_until_ready(pipe.state.n)
put_ms("warmup (3 keyframes)")


def timed_loop(tag):
    pipe.reset()
    t0 = time.perf_counter()
    for fr in frames:
        if pipe.count % gap == 0:
            pipe.process_keyframe(fr)
        pipe.count += 1
    pipe.flush()
    jax.block_until_ready(pipe.state.n)
    dt = time.perf_counter() - t0
    print(f"loop {tag}: {dt*1e3:7.1f} ms ({len(frames)/dt:7.1f} FPS)", flush=True)


timed_loop("run1 (no export)")
put_ms("run1 loop")

timed_loop("run2 (no export)")
put_ms("run2 loop")

ov = int(pipe._label_overflow)
put_ms(f"int(label_overflow)={ov}")

timed_loop("run3 (after scalar D2H)")
put_ms("run3 loop")

world = export_world(pipe.state, class_list=pipe.class_list)
put_ms(f"export_world ({len(world['scores'])} boxes)")

timed_loop("run4 (after export)")
put_ms("run4 loop")

timed_loop("run5")
put_ms("run5 loop")

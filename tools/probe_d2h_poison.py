"""Bisect which D2H transfer re-degrades the tunnel after fused-program runs.

probe_export_poison.py showed: back-to-back fused 400-frame runs stay
healthy (~6500 FPS, put 0.8 ms), but int(label_overflow) -- a scalar D2H of
an eager-add chain hanging off the fused program's outputs -- flips the
process into the degraded mode (put ~40 ms).  The stress pipe
(keyframe_step_packed) tolerates export_world + int() between runs, so the
trigger is narrower.  Candidates, probed in order in ONE process (stop at
the first that degrades; re-run with SKIP=... to reorder):

  a. int(jnp.int32(0) + 1)            -- trivial eager scalar D2H
  b. np.asarray(state.n)               -- D2H of a fused-program output scalar
  c. np.asarray(state.scores[:4])      -- D2H slice of a fused output array
  d. int(label_overflow)               -- the eager-add chain result

Run: python tools/probe_d2h_poison.py [skip-letters, e.g. "ab"]
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

SKIP = sys.argv[1] if len(sys.argv) > 1 else ""

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
    print(f"put after {tag:34s}: {ms:7.2f} ms", flush=True)
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

for i, fr in enumerate(frames[: 2 * gap + 1]):
    if i % gap == 0:
        pipe.process_keyframe(fr)
    pipe.count += 1
pipe.flush()
jax.block_until_ready(pipe.state.n)


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


timed_loop("baseline")
put_ms("baseline loop")

if "a" not in SKIP:
    v = int(jnp.int32(0) + 1)
    put_ms(f"a. int(jnp scalar add)={v}")
    timed_loop("after a")

if "b" not in SKIP:
    v = int(np.asarray(pipe.state.n))
    put_ms(f"b. np.asarray(state.n)={v}")
    timed_loop("after b")

if "c" not in SKIP:
    v = np.asarray(pipe.state.scores[:4])
    put_ms("c. state.scores[:4] D2H")
    timed_loop("after c")

if "d" not in SKIP:
    v = int(pipe._label_overflow)
    put_ms(f"d. int(label_overflow)={v}")
    timed_loop("after d")

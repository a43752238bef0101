"""Microbenchmark of the CuTR detector call: transfer vs dispatch vs compute.

Run from the repo root (PYTHONPATH incl.) on the target backend.
"""
import time

import jax
import numpy as np

from boxfusion_tpu.data.preprocess import Preprocessor
from boxfusion_tpu.data.synthetic import SyntheticSequence
from boxfusion_tpu.models.cutr import make_cutr
from boxfusion_tpu.runtime.detector import CuTRDetector

on_tpu = jax.default_backend() not in ("cpu",)
dim = 768 if on_tpu else 192
S = 512 if on_tpu else 256
N = 30

seq = SyntheticSequence(n_frames=N, n_boxes=8, image_hw=(int(0.75 * S), S), seed=0)
frames = list(seq)

model = make_cutr(dimension=dim, depth_model=True, dtype="bfloat16" if on_tpu else "float32")
pre = Preprocessor()
batch0, _, _ = pre(frames[0].image, frames[0].depth, frames[0].K, frames[0].T_gravity)
params = jax.jit(model.init)(jax.random.PRNGKey(0), batch0)
det = CuTRDetector(model, params, device_output=True)

# warm
out = det(frames[0])
jax.block_until_ready(out["scores"])

# (a) full detector call, pipelined (block only at end)
t0 = time.perf_counter()
for fr in frames:
    out = det(fr)
jax.block_until_ready(out["scores"])
print(f"detector pipelined:        {(time.perf_counter()-t0)/N*1000:7.2f} ms/call")

# (b) full detector call, synchronous
t0 = time.perf_counter()
for fr in frames:
    out = det(fr)
    jax.block_until_ready(out["scores"])
print(f"detector sync:             {(time.perf_counter()-t0)/N*1000:7.2f} ms/call")

# (c) transfers only
t0 = time.perf_counter()
for fr in frames:
    r = jax.device_put(
        (np.ascontiguousarray(fr.image), np.asarray(fr.depth, np.float32),
         np.asarray(fr.K, np.float32), np.asarray(fr.T_gravity, np.float32))
    )
jax.block_until_ready(r)
print(f"device_put tuple:          {(time.perf_counter()-t0)/N*1000:7.2f} ms/call")

# (d) fused fn on device-resident inputs, pipelined
h, w = frames[0].image.shape[:2]
img_d, dep_d, K_d, Tg_d = jax.device_put(
    (frames[0].image, np.asarray(frames[0].depth, np.float32),
     np.asarray(frames[0].K, np.float32), np.asarray(frames[0].T_gravity, np.float32))
)
fn = det._fused_fn(S, 1)
out = fn(params, img_d, dep_d, K_d, Tg_d)
jax.block_until_ready(out["scores"])
t0 = time.perf_counter()
for _ in range(N):
    out = fn(params, img_d, dep_d, K_d, Tg_d)
jax.block_until_ready(out["scores"])
print(f"fused fn (dev inputs):     {(time.perf_counter()-t0)/N*1000:7.2f} ms/call")

# (e) bare model.apply on a resident FrameBatch, pipelined
fwd = jax.jit(model.apply)
b = jax.device_put(batch0)
out = fwd(params, b)
jax.block_until_ready(out["scores"])
t0 = time.perf_counter()
for _ in range(N):
    out = fwd(params, b)
jax.block_until_ready(out["scores"])
print(f"model.apply (resident):    {(time.perf_counter()-t0)/N*1000:7.2f} ms/call")

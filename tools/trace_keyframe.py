"""Capture a jax.profiler device trace of keyframe steps and summarize op times.

Run from the repo root; writes the trace under /tmp/kf_trace (clear it between
runs) and prints the top-40 aggregated event durations.
"""
import gzip
import json
import time

import jax
import numpy as np

from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
from boxfusion_tpu.utils.config import load_config

S, gap = 512, 20
seq = SyntheticSequence(n_frames=200, n_boxes=8, image_hw=(int(0.75 * S), S), seed=0)
frames = list(seq)
oracle = OracleDetector(seq, noise=0.03, seed=1)
kf = [fr for i, fr in enumerate(frames) if i % gap == 0]

cfg = load_config("config/ca1m.yaml")
cfg["data"]._data["gap"] = gap
cfg["detection"]._data["score_thresh"] = 0.3
cfg["detection"]._data["uv_bound"] = False
cfg["detection"]._data["floor_mask"] = False
cfg["box_fusion"]._data["pst_path"] = None

pipe = DevicePipeline(cfg, oracle, capacity=256)
for frame in kf:
    pipe.process_keyframe(frame)
jax.block_until_ready(pipe.state.n)

p2 = DevicePipeline(cfg, oracle, capacity=256)
with jax.profiler.trace("/tmp/kf_trace"):
    for frame in kf:
        p2.process_keyframe(frame)
    jax.block_until_ready(p2.state.n)

# summarize: find trace.json.gz and aggregate device op durations
paths = glob.glob("/tmp/kf_trace/**/*.trace.json.gz", recursive=True)
paths.sort(key=lambda p: -len(p))
with gzip.open(paths[-1], "rt") as f:
    data = json.load(f)

events = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
# device events live on TPU pids; aggregate by name
from collections import defaultdict

agg = defaultdict(float)
cnt = defaultdict(int)
for e in events:
    name = e.get("name", "")
    agg[name] += e.get("dur", 0) / 1e3  # ms
    cnt[name] += 1
rows = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
for name, ms in rows:
    print(f"{ms:9.2f} ms  x{cnt[name]:<5} {name[:110]}")

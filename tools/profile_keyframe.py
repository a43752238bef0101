"""Per-stage wall-clock profile of the device keyframe step at bench scale.

Run from the repo root on the target backend (TPU by default):
    python tools/profile_keyframe.py
"""

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


def run(tag, **over):
    cfg = load_config("config/ca1m.yaml")
    cfg["data"]._data["gap"] = gap
    cfg["detection"]._data["score_thresh"] = 0.3
    cfg["detection"]._data["uv_bound"] = False
    cfg["detection"]._data["floor_mask"] = False
    cfg["box_fusion"]._data["pst_path"] = None
    for k, v in over.items():
        sec, key = k.split(".")
        cfg[sec]._data[key] = v
    pipe = DevicePipeline(cfg, oracle, capacity=256)
    for frame in kf:  # compile + warm
        pipe.process_keyframe(frame)
    pipe.flush()
    jax.block_until_ready(pipe.state.n)
    times = []
    for _ in range(3):
        p2 = DevicePipeline(cfg, oracle, capacity=256)
        t0 = time.perf_counter()
        for frame in kf:
            p2.process_keyframe(frame)
        p2.flush()
        jax.block_until_ready(p2.state.n)
        times.append(time.perf_counter() - t0)
    dt = np.median(times)
    print(f"{tag:<40} {dt/len(kf)*1000:7.2f} ms/keyframe")


run("full (fusion on, 1024 particles)")
run("fusion off", **{"box_fusion.use": False})
run("fusion 256 particles", **{"box_fusion.pst_size": 256})
run("fusion iters=5", **{"box_fusion.iters": 5})
run("max_fusions=1", **{"box_fusion.max_fusions_per_frame": 1})

"""Round-5 completion-forced profile: bucketing A/B + stage decomposition.

Every timed window warms up with a fetch and closes with a scalar D2H
INSIDE the window (the round-4 protocol, bench.py docstring) -- the
tunneled backend otherwise defers real execution past block_until_ready.

Sections (select with argv[1], default "gap1"):
  gap1   -- the live-SLAM A/B: fused keyframe path at gap=1 with label
            bucketing ON vs OFF, plus labeler-off / fusion-off ablations.
  stages -- per-stage micro: CLIP tower at each bucket, crop+resize,
            oracle association step with fusion on/off.
  det    -- detector ablations: full forward vs fewer decoder layers /
            fewer queries (directs the MFU work).

Run: python tools/profile_r5.py [gap1|stages|det]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed_pipe_run(pipe, frames, gap, n_runs=2):
    import jax

    best = None
    for _ in range(n_runs):
        pipe.reset()
        t0 = time.perf_counter()
        pipe.run(frames, gap=gap, export=False)
        int(pipe.state.n)  # completion fetch INSIDE the window
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return len(frames) / best


def section_gap1():
    import bench
    import jax

    from boxfusion_tpu.runtime.detector import CuTRDetector
    from boxfusion_tpu.runtime.fused import FusedDevicePipeline

    on_tpu = jax.default_backend() not in ("cpu",)
    wl = bench._workload(on_tpu)
    model, params, _ = bench._build_model(on_tpu, wl)
    labeler = bench._make_labeler(on_tpu)
    _seq, frames = bench._frames(wl)
    kf = frames[: wl["n_frames"] // 4]
    capacity = 2048 if on_tpu else 256

    def make_cfg(bucketing=True, fusion=True):
        cfg = bench._bench_cfg(on_tpu, wl)
        if on_tpu:
            cfg["detection"]._data["max_label_boxes"] = 128
            cfg["association"]._data["max_observations"] = 16384
        cfg["detection"]._data["label_bucketing"] = bucketing
        cfg["box_fusion"]._data["use"] = fusion
        return cfg

    variants = [
        ("bucketed (default)", dict(bucketing=True), labeler),
        ("fixed 128-crop pad", dict(bucketing=False), labeler),
        ("bucketed, fusion off", dict(bucketing=True, fusion=False), labeler),
        ("no labeler", dict(bucketing=True), None),
    ]
    for tag, kw, lab in variants:
        pipe = FusedDevicePipeline(
            make_cfg(**kw), CuTRDetector(model, params), labeler=lab,
            capacity=capacity,
        )
        for fr in kf[:3]:
            pipe.process_keyframe(fr)
            pipe.count += 1
        pipe.flush()
        int(pipe.state.n)  # compile + truthful-mode fetch
        kfs = _timed_pipe_run(pipe, kf, 1)
        print(f"gap1 {tag:24s} {kfs:7.2f} keyframes/s  ({1e3/kfs:7.1f} ms/kf)",
              flush=True)

    # headline check at gap 20 with bucketing
    pipe = FusedDevicePipeline(
        make_cfg(), CuTRDetector(model, params), labeler=labeler,
        capacity=capacity,
    )
    for i, fr in enumerate(frames[: 2 * wl["gap"] + 1]):
        if i % wl["gap"] == 0:
            pipe.process_keyframe(fr)
        pipe.count += 1
    pipe.flush()
    int(pipe.state.n)
    fps = _timed_pipe_run(pipe, frames, wl["gap"])
    print(f"gap20 headline (bucketed)    {fps:7.2f} FPS", flush=True)


def section_stages():
    import bench

    bench.phase_stages("/tmp/profile_r5_stages.json", 600.0)
    import json

    print(json.dumps(json.load(open("/tmp/profile_r5_stages.json")), indent=1))


def section_det():
    import bench
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() not in ("cpu",)
    wl = bench._workload(on_tpu)

    import dataclasses as dc

    from boxfusion_tpu.models.cutr import make_cutr

    def timed_fwd(tag, **cfg_kw):
        model = make_cutr(
            dimension=wl["dim"], depth_model=True,
            dtype="bfloat16" if on_tpu else "float32", **cfg_kw,
        )
        model2, params, batch = bench._build_model(on_tpu, wl)
        del model2
        # re-init for this architecture (param shapes may differ)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

        @jax.jit
        def chained(params, batch, eps):
            out = model.apply(params, dc.replace(batch, image=batch.image + eps))
            dep = sum(jnp.sum(v).astype(jnp.float32) for v in jax.tree.leaves(out))
            return dep * 1e-12 + eps + 1e-3

        reps = 30 if on_tpu else 3
        eps = chained(params, batch, jnp.float32(0.0))
        float(eps)
        t0 = time.perf_counter()
        for _ in range(reps):
            eps = chained(params, batch, eps)
        float(eps)
        ms = (time.perf_counter() - t0) / reps * 1e3
        fl = bench._compiled_flops(chained, params, batch, jnp.float32(0.0))
        print(f"det {tag:28s} {ms:7.2f} ms   {fl/1e9:7.1f} GFLOP   "
              f"{fl/(ms*1e-3)/1e12:6.1f} TF/s", flush=True)
        return ms

    full = timed_fwd("full (6 dec layers, 300q)")
    d1 = timed_fwd("1 decoder layer", num_decoder_layers=1)
    q100 = timed_fwd("100 queries", num_queries=100)
    print(f"det decoder 5-layer delta: {full - d1:.2f} ms; "
          f"queries300->100 delta: {full - q100:.2f} ms", flush=True)


if __name__ == "__main__":
    from boxfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    sec = sys.argv[1] if len(sys.argv) > 1 else "gap1"
    {"gap1": section_gap1, "stages": section_stages, "det": section_det}[sec]()

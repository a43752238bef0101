"""Where does a gap=1 keyframe's wall time go?

Breaks the live-SLAM profile (every frame a keyframe, cubicle.yaml:7) into:
  1. host pack only        pack_fused_buffer per frame, no dispatch
  2. dispatch only         pre-packed buffers, process_keyframe's device path
  3. full loop             pack + dispatch (the bench's keyframes_per_s_gap1)
  4. labeler ablation      full loop without the CLIP labeler

Run: python tools/profile_gap1.py  (uses the bench's exact TPU workload)
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from boxfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    import bench

    on_tpu = jax.devices()[0].platform != "cpu"
    wl = bench._workload(on_tpu)
    S, n_frames = wl["S"], wl["n_frames"]
    n_kf = n_frames // 4

    from boxfusion_tpu.runtime.detector import CuTRDetector
    from boxfusion_tpu.runtime.fused import FusedDevicePipeline, pack_fused_buffer

    model, params, _batch = bench._build_model(on_tpu, wl)
    labeler = bench._make_labeler(on_tpu)
    _seq, frames = bench._frames(wl)
    frames = frames[:n_kf]

    cfg = bench._bench_cfg(on_tpu, wl)
    capacity = 2048 if on_tpu else 256
    if on_tpu:
        cfg["detection"]._data["max_label_boxes"] = 128
        cfg["association"]._data["max_observations"] = 16384

    def run_pipe(pipe, tag):
        for fr in frames[:3]:
            pipe.process_keyframe(fr)
            pipe.count += 1
        pipe.flush()
        jax.block_until_ready(pipe.state.n)
        best = 0.0
        for _ in range(3):
            pipe.reset()
            pipe.run(frames, gap=1, export=False)
            best = max(best, pipe.fps)
        print(f"{tag:28s} {best:8.1f} keyframes/s  ({1e3 / best:6.2f} ms/kf)",
              flush=True)
        return best

    pipe = FusedDevicePipeline(cfg, CuTRDetector(model, params),
                               labeler=labeler, capacity=capacity)

    # 1. host pack only
    for _ in range(2):
        t0 = time.perf_counter()
        for fr in frames:
            pack_fused_buffer(fr, 0, pipe.depth_mode, pipe.depth_scale)
        dt = time.perf_counter() - t0
    print(f"{'host pack only':28s} {n_kf / dt:8.1f} keyframes/s  "
          f"({dt / n_kf * 1e3:6.2f} ms/kf)", flush=True)

    # 3. full loop (the bench figure)
    run_pipe(pipe, "full loop (bench gap1)")

    # 2. dispatch only: pre-pack every frame, drive _fused_step directly on
    # this thread (no executor, no pack) -- isolates upload+execute
    packed = [pack_fused_buffer(fr, i, pipe.depth_mode, pipe.depth_scale)
              for i, fr in enumerate(frames)]
    from boxfusion_tpu.data.preprocess import resolve_pad_and_ratio

    fr0 = frames[0]
    square, ratio = resolve_pad_and_ratio(fr0.image, fr0.depth,
                                          pipe.detector.buckets)
    h, w = fr0.image.shape[:2]
    dh, dw = fr0.depth.shape[:2]
    fn = pipe._get_fused((h, w, dh, dw, square, ratio))
    best = 0.0
    for _ in range(3):
        pipe.reset()
        jax.block_until_ready(pipe.state.n)
        t0 = time.perf_counter()
        for buf in packed:
            pipe._fused_step(fn, buf)
        jax.block_until_ready(pipe.state.n)
        dt = time.perf_counter() - t0
        best = max(best, n_kf / dt)
    print(f"{'dispatch only (pre-packed)':28s} {best:8.1f} "
          f"keyframes/s  ({1e3 / best:6.2f} ms/kf)", flush=True)

    # 4. no labeler
    pipe_nl = FusedDevicePipeline(cfg, CuTRDetector(model, params),
                                  labeler=None, capacity=capacity)
    run_pipe(pipe_nl, "full loop, no labeler")

    # 5. chunked throughput mode (one lax.scan dispatch per 8 keyframes)
    pipe_ch = FusedDevicePipeline(cfg, CuTRDetector(model, params),
                                  labeler=labeler, capacity=capacity, chunk=8)
    run_pipe(pipe_ch, "full loop, chunk=8")


if __name__ == "__main__":
    main()

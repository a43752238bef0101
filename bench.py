"""End-to-end benchmark: online detection + fusion FPS at CA-1M scale.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (mirrors the reference's headline setting, BASELINE.md): posed
RGB-D stream at CA-1M resolution (512x384 -> 512 square pad), keyframe gap
20, CuTR ViT-B/16 RGB-D forward per keyframe, full spatial + correspondence
association and 1024-particle x 20-iteration multi-view PST fusion.  The
sequence is synthetic (no dataset in the image) and detections come from the
deterministic oracle so that association/fusion run a realistic box load;
the CuTR forward is executed (random weights -- identical FLOPs) and timed
as part of every keyframe.

vs_baseline: the reference publishes no FPS (BASELINE.md); the paper-level
claim for the CUDA pipeline is ~10 FPS end-to-end on a desktop GPU, so
vs_baseline = value / 10.0 until a measured reference number lands.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
    from boxfusion_tpu.models.cutr import FrameBatch, make_cutr
    from boxfusion_tpu.runtime import OnlinePipeline
    from boxfusion_tpu.utils.config import load_config

    on_tpu = jax.default_backend() not in ("cpu",)
    dim = 768 if on_tpu else 192
    S, r = (512, 1) if on_tpu else (256, 4)
    n_frames, gap = (400, 20) if on_tpu else (40, 20)

    # --- CuTR forward per keyframe (timed inside the loop) -----------------
    # bf16 compute on TPU (MXU-native, coordinate math stays f32 -- the
    # production config default); f32 on the CPU fallback.
    model = make_cutr(
        dimension=dim, depth_model=True,
        dtype="bfloat16" if on_tpu else "float32",
    )
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
    fwd = jax.jit(model.apply)
    jax.block_until_ready(fwd(params, batch))  # compile

    seq = SyntheticSequence(
        n_frames=n_frames, n_boxes=8, image_hw=(int(0.75 * S), S), seed=0
    )
    frames = list(seq)  # materialize: frame synthesis is not pipeline work
    oracle = OracleDetector(seq, noise=0.03, seed=1)

    class BenchDetector:
        """Enqueues the real CuTR forward (its device time is serialized into
        the measured stream), returns oracle detections so association/fusion
        see a realistic, deterministic box load."""

        def __call__(self, frame):
            fwd(params, batch)  # async; device work lands in the timed stream
            return oracle(frame)

    from boxfusion_tpu.runtime.device_pipeline import DevicePipeline

    cfg = load_config("config/ca1m.yaml")
    cfg["data"]._data["gap"] = gap
    cfg["detection"]._data["score_thresh"] = 0.3
    cfg["detection"]._data["uv_bound"] = False
    cfg["detection"]._data["floor_mask"] = False
    cfg["box_fusion"]._data["pst_path"] = None
    if not on_tpu:
        cfg["box_fusion"]._data["pst_size"] = 256
        cfg["box_fusion"]._data["max_fusions_per_frame"] = 4
        cfg["association"]._data["max_views"] = 5

    # warmup run compiles the device keyframe step (persistent-cached)
    warm = DevicePipeline(cfg, BenchDetector(), capacity=256)
    for i, frame in enumerate(frames[: 2 * gap + 1]):
        if i % gap == 0:
            warm.process_keyframe(frame)
        warm.count += 1
    warm.flush()
    jax.block_until_ready(warm.state.n)

    # median of 5 runs: the tunneled single-chip TPU shows high run-to-run
    # variance (see docs/TUNNEL_PERF_NOTES.md), and the driver records a
    # single number
    fps_runs = []
    for _ in range(5):
        # fresh oracle per run: its RNG is consumed per call, and the runs
        # must measure an identical detection workload
        oracle = OracleDetector(seq, noise=0.03, seed=1)
        pipe = DevicePipeline(cfg, BenchDetector(), capacity=256)
        pipe.run(frames, gap=gap)  # blocks on device state before timing ends
        fps_runs.append(pipe.fps)
    fps = float(np.median(fps_runs))

    print(
        json.dumps(
            {
                "metric": f"online e2e FPS (CuTR-{dim} bf16 @ {S}px, gap {gap}, device-resident assoc+fusion)",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

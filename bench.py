"""End-to-end benchmark: online detection + fusion FPS at CA-1M scale.

Prints incremental JSON lines as figures land -- the LAST parseable line is
the record (and every emission is mirrored to BENCH_partial.json), so a
driver-side timeout costs only the figures not yet measured, never the ones
already taken.  Round 3 lost its entire perf record to an all-or-nothing
bench (rc 124, nothing printed); this structure makes that impossible.

Emission order (each line is a superset of the previous):
  1. detector microbench (CuTR forward ms / TFLOP/s / MFU vs the measured
     bf16 matmul ceiling of the attached chip) -- marked preliminary;
  2. HEADLINE: the real path -- posed RGB-D stream at CA-1M resolution
     (512x384), keyframe gap 20; per keyframe ONE fused device program runs
     CuTR ViT-B/16 RGB-D detection, open-vocab CLIP labeling, and the
     device-resident association + 1024-particle multi-view PST fusion step
     (runtime/fused.py; mirrors the reference's per-keyframe stages
     demo.py:136-171,262-305).  Model weights are random (identical FLOPs
     to converted checkpoints); the synthetic stream is host-generated.
     Sized NOT to saturate (2048-slot world, 128-crop label budget):
     every surviving detection gets a world slot, a CLIP label and an
     observation-bank entry -- asserted from the exported stats at the end;
  3+. secondaries, each deadline-gated and individually guarded:
     gap=1 live-SLAM profile, oracle-detection stress load, 4-lane
     multi-stream serving, I/O-inclusive FPS from a real on-disk CA-1M
     layout; then the final enriched line adds the world stats +
     headline_saturated (the one end-of-bench D2H readback).

The whole bench runs under an internal deadline (BENCH_DEADLINE_S env,
default 1500 s): once exceeded, remaining secondaries are skipped and the
final stats line is emitted with whatever was measured.

vs_baseline: the reference publishes no FPS (BASELINE.md); the paper-level
claim for the CUDA pipeline is ~10 FPS end-to-end on a desktop GPU
(including real dataset I/O, which the headline excludes but the
io_inclusive secondary pays), so vs_baseline = value / 10.0 is an
ESTIMATE, labeled as such.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

_T0 = time.monotonic()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
_PARTIAL_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_partial.json")


def _remaining() -> float:
    return _DEADLINE_S - (time.monotonic() - _T0)


def _log(msg: str) -> None:
    print(f"bench[{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _emit(result: dict) -> None:
    """Print the current figure set as ONE JSON line (stdout) and mirror it
    to BENCH_partial.json.  Called after every measurement: the driver keeps
    the last parseable line, so each emission supersedes the previous."""
    line = json.dumps(result)
    print(line, flush=True)
    try:
        with open(_PARTIAL_PATH, "w") as f:
            f.write(line + "\n")
    except OSError as e:  # a read-only checkout must not kill the bench
        _log(f"partial-file write failed: {e}")


# bf16 peak TFLOP/s per chip by device_kind substring (headline MXU rates).
_PEAK_TFLOPS = (
    ("v6e", 918.0),
    ("v6", 918.0),
    ("v5p", 459.0),
    ("v5e", 197.0),
    ("v5 lite", 197.0),
    ("v5litepod", 197.0),
    ("v4", 275.0),
)


def _chip_peak_tflops(device) -> tuple:
    kind = getattr(device, "device_kind", "unknown").lower()
    for key, peak in _PEAK_TFLOPS:
        if key in kind:
            return peak, kind
    return 197.0, kind + " (assumed v5e peak)"


def _compiled_flops(fn, *args) -> float:
    """Analytic FLOP count from XLA's cost model (0.0 if unavailable)."""
    try:
        cost = fn.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _measure_matmul_peak(on_tpu: bool) -> tuple:
    """Measured-achievable bf16 matmul TFLOP/s on the attached chip.

    The device_kind-table peak proved unusable in round 2: the tunnel fronts
    newer silicon than its self-reported kind (detector sustained 792 TFLOP/s
    vs the claimed v5e 197 peak).  So measure the ceiling directly: a jitted
    chain of large square bf16 matmuls with a hard data dependency between
    every matmul (fori_loop carry) AND between every dispatch (the output
    feeds the next call), so neither XLA nor the relay can overlap, dedup, or
    memoize anything.  A cheap O(n^2) renormalize per step keeps values
    finite without touching the O(n^3) term.  MFU is reported against THIS
    number (detector_mfu_vs_measured_peak), which is <= 1 by construction
    up to measurement noise.
    """
    import jax
    import jax.numpy as jnp

    n, inner, reps = (8192, 8, 10) if on_tpu else (512, 2, 2)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    k0, k1 = jax.random.split(jax.random.PRNGKey(7))
    w = (jax.random.normal(k0, (n, n)) * (1.0 / np.sqrt(n))).astype(dt)
    x0 = jax.random.normal(k1, (n, n)).astype(dt)

    @jax.jit
    def chain(x):
        def body(_, x):
            y = x @ w
            return (y * (1.0 / (jnp.max(jnp.abs(y)).astype(jnp.float32) + 1e-6))).astype(dt)

        return jax.lax.fori_loop(0, inner, body, x)

    x = chain(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = chain(x)
    jax.block_until_ready(x)
    elapsed = time.perf_counter() - t0
    tflops_per_s = reps * inner * 2.0 * float(n) ** 3 / elapsed / 1e12
    return tflops_per_s, n, inner


def _probe_backend_alive(timeout_s: float = 55.0, attempts: int = 3) -> None:
    """The tunneled backend sometimes hangs outright (a tiny op never
    returns, 0% CPU -- docs/TUNNEL_PERF_NOTES.md).  A hung backend would
    stall this process forever inside a blocking PJRT call, so probe it in
    a KILLABLE subprocess first.  Total probe budget is capped at ~3 min
    (3 x 55 s + short waits): round 3's 6 x 120 s budget could burn >13
    minutes before any measurement."""
    import subprocess

    # honor JAX_PLATFORMS explicitly: the axon sitecustomize pre-registers
    # the TPU backend, so the env var alone does not flip the child to CPU
    # (tests/conftest.py documents the same) -- a CPU-forced bench must not
    # fail on a dead tunnel it is not going to use.
    code = (
        "import os, jax\n"
        "p = os.environ.get('JAX_PLATFORMS')\n"
        "if p: jax.config.update('jax_platforms', p)\n"
        "import jax.numpy as jnp\n"
        "jax.block_until_ready(jnp.ones(8) + 1)\n"
    )
    for attempt in range(1, attempts + 1):
        try:
            subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s, check=True,
                capture_output=True,
            )
            return
        except subprocess.TimeoutExpired:
            _log(
                f"backend unresponsive (tiny op hung > {timeout_s:.0f}s, "
                f"attempt {attempt}/{attempts})"
            )
        except subprocess.CalledProcessError as e:
            # outage flavor 2: the relay refuses/errors instead of hanging
            tail = (e.stderr or b"").decode(errors="replace").strip().splitlines()
            msg = next(
                (ln for ln in reversed(tail) if "Error" in ln or "error" in ln),
                tail[-1] if tail else "no stderr",
            )
            _log(f"backend init failed (attempt {attempt}/{attempts}): {msg}")
            if attempt < attempts:
                time.sleep(15)
    _log(
        f"the attached accelerator/tunnel stayed down across {attempts} "
        "probes -- not emitting a bogus measurement"
    )
    raise SystemExit(3)


def main() -> None:
    from boxfusion_tpu.utils.cache import enable_compilation_cache

    _probe_backend_alive()
    enable_compilation_cache()  # fused-program compile is minutes; one-time per machine

    import jax
    import jax.numpy as jnp

    from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
    from boxfusion_tpu.models.clip.head import OpenVocabLabeler
    from boxfusion_tpu.models.clip.model import CLIPConfig
    from boxfusion_tpu.models.cutr import FrameBatch, make_cutr
    from boxfusion_tpu.runtime.detector import CuTRDetector
    from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
    from boxfusion_tpu.runtime.fused import FusedDevicePipeline
    from boxfusion_tpu.utils.config import load_config

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype_tag = "bf16" if on_tpu else "f32"
    dim = 768 if on_tpu else 192
    S, r = (512, 1) if on_tpu else (256, 4)
    n_frames, gap = (400, 20) if on_tpu else (40, 20)
    n_runs = 3 if on_tpu else 2

    result: dict = {}

    # --- CuTR model (bf16 MXU compute on TPU; f32 CPU fallback) -------------
    _log(f"building CuTR-{dim} ({dtype_tag})")
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

    # Calibrate the foreground-class bias: random-init logits sit near the
    # prior (score ~0.02), so NO detection would pass the 0.3 raw-score
    # filter and the "real path" would associate/fuse nothing.  +3.2 on
    # every per-layer class head puts ~40-100 detections/keyframe above the
    # filter (measured ladder: +3.0 -> 40, +3.5 -> 100 of 100) -- a
    # realistic CA-1M indoor load for the association/fusion/labeling
    # stages.  FLOPs are unchanged.
    def _lift_bias(path, leaf):
        keys = [getattr(p, "key", "") for p in path]
        if any("class_predictor" in k for k in keys) and keys[-1] == "bias":
            return leaf + 3.2
        return leaf

    params = jax.tree_util.tree_map_with_path(_lift_bias, params)
    fwd = jax.jit(model.apply)
    jax.block_until_ready(fwd(params, batch))  # compile
    _log("CuTR forward compiled")

    # --- 1. detector microbench: device time, analytic FLOPs, MFU -----------
    # 20 back-to-back dispatches with a DATA DEPENDENCY chaining each rep to
    # the previous output: identical independent dispatches measured 3.8x
    # peak MFU on the tunneled backend (dedup/overlap in the relay), so the
    # chain forces genuinely serial execution; the queue still keeps the
    # chip busy (per-call sync would add tunnel RPC latency to every
    # sample, see docs/TUNNEL_PERF_NOTES.md).
    import dataclasses as _dc

    @jax.jit
    def chained(params, batch, eps):
        out = model.apply(params, _dc.replace(batch, image=batch.image + eps))
        # dependency scalar folds in EVERY output so XLA cannot dead-code-
        # eliminate any head (flops counted below are of this same program)
        dep = sum(jnp.sum(v).astype(jnp.float32) for v in jax.tree.leaves(out))
        # strictly increasing carry: each rep's input eps is DISTINCT.  A
        # sub-f32-ulp perturbation rounds away, the calls become bit-identical
        # and the remote relay memoizes them (measured 3.2x "MFU" that way);
        # the +1e-3 keeps every execution genuinely unique with no extra
        # dispatches or host transfers.
        return dep * 1e-12 + eps + 1e-3

    reps = 20
    eps = chained(params, batch, jnp.float32(0.0))
    jax.block_until_ready(eps)
    t0 = time.perf_counter()
    for _ in range(reps):
        eps = chained(params, batch, eps)
    jax.block_until_ready(eps)
    det_ms = (time.perf_counter() - t0) / reps * 1e3
    det_flops = _compiled_flops(chained, params, batch, jnp.float32(0.0))
    tflops_per_s = det_flops / (det_ms * 1e-3) / 1e12 if det_flops else 0.0
    peak, chip = _chip_peak_tflops(jax.devices()[0])
    mfu = tflops_per_s / peak if tflops_per_s else 0.0

    # measured ceiling: large bf16 matmul chain on THIS chip (see docstring)
    measured_peak, probe_n, probe_inner = _measure_matmul_peak(on_tpu)
    mfu_measured = tflops_per_s / measured_peak if measured_peak else 0.0
    mfu_note = None
    if mfu > 1.0:
        # Round 2 flagged detector TFLOP/s above the self-reported device
        # kind's table peak.  The matmul probe gives the resolution: the
        # chip's actually-achievable ceiling is measured_peak, and MFU is
        # reported against it (detector_mfu_vs_measured_peak <= 1).
        mfu_note = (
            f"detector {tflops_per_s:.0f} TFLOP/s exceeds the {peak:.0f} "
            f"TFLOP/s bf16 table peak of the self-reported '{chip}'; the "
            f"measured bf16 matmul ceiling of this chip is {measured_peak:.0f} "
            "TFLOP/s -- use detector_mfu_vs_measured_peak, not detector_mfu"
        )

    result.update(
        {
            # PRELIMINARY record in case the headline never lands: the
            # detector-only figure.  Overwritten by the headline emission.
            "metric": (
                f"CuTR-{dim} {dtype_tag} detector forward @ {S}px "
                "(PRELIMINARY -- headline e2e FPS pending)"
            ),
            "value": round(1000.0 / det_ms, 3),
            "unit": "forwards/s",
            "vs_baseline": round((1000.0 / det_ms) / 10.0, 3),
            "detector_ms": round(det_ms, 3),
            "detector_gflops": round(det_flops / 1e9, 1),
            "detector_tflops_per_s": round(tflops_per_s, 2),
            "detector_mfu": round(mfu, 4),
            # measured ceiling: chained large bf16 matmul on this chip
            # (the honest MFU denominator; see _measure_matmul_peak)
            "measured_peak_tflops_bf16_matmul": round(measured_peak, 2),
            "matmul_probe_shape": f"{probe_n}x{probe_n}x{probe_n} x{probe_inner}",
            "detector_mfu_vs_measured_peak": round(mfu_measured, 4),
            "chip": chip,
            "chip_peak_tflops_bf16": peak,
            **({"mfu_note": mfu_note} if mfu_note else {}),
        }
    )
    _emit(result)
    _log(f"detector microbench done ({det_ms:.2f} ms, {tflops_per_s:.0f} TFLOP/s)")

    # --- shared sequence + config -------------------------------------------
    seq = SyntheticSequence(
        n_frames=n_frames, n_boxes=8, image_hw=(int(0.75 * S), S), seed=0
    )
    frames = list(seq)  # materialize: frame synthesis is not pipeline work

    def _bench_cfg():
        c = load_config("config/ca1m.yaml")
        c["data"]._data["gap"] = gap
        c["detection"]._data["score_thresh"] = 0.3
        c["detection"]._data["uv_bound"] = False
        c["detection"]._data["floor_mask"] = False
        c["box_fusion"]._data["pst_path"] = None
        if not on_tpu:
            c["box_fusion"]._data["pst_size"] = 256
            c["box_fusion"]._data["max_fusions_per_frame"] = 4
            c["association"]._data["max_views"] = 5
        return c

    # stress/serving profile: the production 256-slot, 32-crop budget --
    # DELIBERATELY saturating under this random-box load (counters stay
    # exported; real scenes hold far fewer objects)
    cfg = _bench_cfg()

    # headline profile: sized so NOTHING saturates at this detection rate
    # (~40-100 raw/keyframe x 20 keyframes): every surviving detection gets
    # a world slot, a CLIP label, and an observation-bank entry.  The
    # headline FPS therefore pays full per-detection work; zero capacity
    # drops is asserted from the exported stats in the final emission.
    # Capacity 2048 compiles fast since the unrolled-NMS chains are bounded
    # by StepConfig.max_nms_sweeps/max_nms_records, not capacity
    # (device_step.py) -- round 3's capacity-length unroll was the compile
    # blowup that timed the bench out.
    cfg_headline = _bench_cfg()
    headline_capacity = 2048 if on_tpu else 256
    if on_tpu:
        cfg_headline["detection"]._data["max_label_boxes"] = 128
        cfg_headline["association"]._data["max_observations"] = 16384

    # --- 2. HEADLINE: the real path, one fused dispatch per keyframe --------
    # CuTR detection -> CLIP labeling (budget max_label_boxes) -> device
    # association+fusion, all inside one jitted program (runtime/fused.py).
    # CLIP image tower at ViT-L/14 scale (the fork's active image model,
    # reference demo.py:459) with the reference's 473-class text features.
    if on_tpu:
        clip_cfg = CLIPConfig(
            patch=14, width=1024, layers=24, heads=16, embed_dim=1024,
            dtype=jnp.bfloat16,
        )
        n_classes, feat_dim = 473, 1024
    else:
        clip_cfg = CLIPConfig(
            patch=32, width=64, layers=2, heads=2, embed_dim=32,
            vocab_size=64, context_length=8, text_width=64, text_layers=1, text_heads=2,
        )
        n_classes, feat_dim = 8, 32
    text_features = np.random.RandomState(1).randn(n_classes, feat_dim).astype(np.float32)
    classes = [f"class{i}" for i in range(n_classes)]

    labeler = OpenVocabLabeler(classes, text_features, cfg=clip_cfg).init_random(0)
    real_pipe = FusedDevicePipeline(
        cfg_headline, CuTRDetector(model, params), labeler=labeler,
        capacity=headline_capacity,
    )

    # warmup compiles the fused program (persistent-cached); timed runs
    # reset + reuse the pipeline (fresh state, cached executables)
    _log("compiling fused keyframe program (headline profile)")
    for i, frame in enumerate(frames[: 2 * gap + 1]):
        if i % gap == 0:
            real_pipe.process_keyframe(frame)
        real_pipe.count += 1
    real_pipe.flush()
    jax.block_until_ready(real_pipe.state.n)
    _log("fused program compiled; timing headline")

    # export=False: a world export is a D2H of computed device buffers, and
    # ANY such readback permanently flips the tunneled backend into its
    # ~30x-degraded dispatch mode (docs/TUNNEL_PERF_NOTES.md; measured 20x
    # FPS collapse on run 2).  Timed runs stay D2H-free; one export happens
    # after ALL timing, at the bottom of main().
    real_runs = []
    for _ in range(n_runs):
        real_pipe.reset()
        real_pipe.run(frames, gap=gap, export=False)
        real_runs.append(real_pipe.fps)
    real_fps = float(np.median(real_runs))

    # hold the LAST HEADLINE run's final state for the end-of-bench export
    # (later profiles replace pipe.state; this reference keeps the device
    # buffers alive, still without any D2H)
    headline_state = real_pipe.state

    result.update(
        {
            "metric": (
                f"online e2e FPS, real path: CuTR-{dim} {dtype_tag} detect + CLIP "
                f"label + device-resident assoc+fusion @ {S}px, gap {gap}, one "
                "fused dispatch/keyframe (synthetic stream, random weights, "
                "class bias calibrated to ~40-100 raw detections/keyframe; "
                f"non-saturating profile: {headline_capacity}-slot world, "
                f"{int(cfg_headline['detection']['max_label_boxes'])}-crop "
                "label budget)"
            ),
            "value": round(real_fps, 3),
            "unit": "frames/s",
            # ESTIMATE: paper-level ~10 FPS CUDA e2e claim, which includes
            # dataset I/O this headline excludes (no measured ref run exists;
            # see io_inclusive_fps_ca1m_layout for the I/O-paying figure).
            "vs_baseline": round(real_fps / 10.0, 3),
        }
    )
    _emit(result)
    _log(f"headline done: {real_fps:.1f} FPS (runs: {[round(x, 1) for x in real_runs]})")

    # --- 3. SECONDARY: gap=1 (keyframe EVERY frame, the cubicle.yaml
    # live-SLAM profile) -- detection+labeling+association+fusion per frame.
    # Reuses the already-compiled fused program: cheap, always runs.
    kf1_frames = frames[: n_frames // 4]
    for fr in kf1_frames[:3]:
        real_pipe.process_keyframe(fr)
        real_pipe.count += 1
    real_pipe.flush()
    jax.block_until_ready(real_pipe.state.n)
    kf1_runs = []
    for _ in range(n_runs):
        real_pipe.reset()
        real_pipe.run(kf1_frames, gap=1, export=False)
        kf1_runs.append(real_pipe.fps)
    kf1_fps = float(np.median(kf1_runs))
    result["keyframes_per_s_gap1"] = round(kf1_fps, 3)
    _emit(result)
    _log(f"gap=1 secondary done: {kf1_fps:.1f} keyframes/s")

    # --- 4. SECONDARY: oracle-detection stress load -------------------------
    if _remaining() > 240:
        try:
            class BenchDetector:
                """Enqueues the real CuTR forward (its device time serializes
                into the measured stream), returns oracle detections so
                association and fusion see a deterministic, high-occupancy
                box load."""

                def __init__(self):
                    self.oracle = OracleDetector(seq, noise=0.03, seed=1)

                def __call__(self, frame):
                    fwd(params, batch)  # async; lands in the timed stream
                    return self.oracle(frame)

            stress_pipe = DevicePipeline(cfg, BenchDetector(), capacity=256)
            for i, frame in enumerate(frames[: 2 * gap + 1]):
                if i % gap == 0:
                    stress_pipe.process_keyframe(frame)
                stress_pipe.count += 1
            stress_pipe.flush()
            jax.block_until_ready(stress_pipe.state.n)

            stress_runs = []
            for _ in range(n_runs):
                stress_pipe.reset()
                # fresh oracle per run: its RNG is consumed per call, and runs
                # must measure an identical detection workload
                stress_pipe.detector = BenchDetector()
                stress_pipe.run(frames, gap=gap, export=False)
                stress_runs.append(stress_pipe.fps)
            result["stress_fps_oracle_load"] = round(float(np.median(stress_runs)), 3)
            _emit(result)
            _log(f"stress secondary done: {result['stress_fps_oracle_load']:.1f} FPS")
        except Exception as e:  # noqa: BLE001
            _log(f"stress secondary skipped: {e}")
    else:
        _log(f"stress secondary skipped: {_remaining():.0f}s left of deadline")

    # --- 5. SECONDARY: multi-stream serving throughput ----------------------
    # 4 independent sequences in lockstep on ONE chip (runtime/batched.py):
    # each keyframe round is one (4, ...) CuTR forward (MXU batching), CLIP
    # labeling, and the vmapped association/fusion step, fed by ONE packed
    # (4, L) byte upload + ONE dispatch.  Aggregate frames/s across lanes --
    # the production many-streams-per-chip figure.
    if on_tpu and _remaining() > 300:
        try:
            from boxfusion_tpu.runtime.batched import BatchedPipeline

            lane_seqs = [
                list(SyntheticSequence(
                    n_frames=n_frames // 2, n_boxes=8,
                    image_hw=(int(0.75 * S), S), seed=10 + s,
                ))
                for s in range(4)
            ]
            bp = BatchedPipeline(
                cfg, CuTRDetector(model, params), n_lanes=4, capacity=256,
                transport="packed", labeler=labeler,
            )
            bp.run(lane_seqs, gap=gap, export=False)  # warmup compile
            ms_runs = []
            for _ in range(n_runs):
                bp.reset()
                bp.run(lane_seqs, gap=gap, export=False)
                ms_runs.append(sum(bp.lane_fps))
            result["multistream_fps_4lanes_packed"] = round(
                float(np.median(ms_runs)), 3
            )
            _emit(result)
            _log(
                "multistream secondary done: "
                f"{result['multistream_fps_4lanes_packed']:.1f} FPS aggregate"
            )
        except Exception as e:  # noqa: BLE001
            _log(f"multi-stream secondary skipped: {e}")
    elif on_tpu:
        _log(f"multistream secondary skipped: {_remaining():.0f}s left of deadline")

    # --- 6. SECONDARY: I/O-inclusive FPS (real dataset path) ----------------
    # The reference's printed FPS (demo.py:363-366) INCLUDES dataset I/O: its
    # loop decodes a png/jpg pair from disk for every frame
    # (capture_stream.py:194-206, 452-460) on the demo thread.  The headline
    # above streams pre-materialized host arrays, so also measure the figure
    # the reference actually prints: the same synthetic sequence written to
    # disk in the CA-1M layout (rgb/*.png + 16-bit depth/*.png +
    # all_poses.npy + K_depth.txt), streamed back through CA1MDataset --
    # native C++ libpng decode (native/loader.cc) + threaded Prefetcher --
    # into the SAME fused pipeline.  Every frame pays disk read + PNG decode
    # + orientation + resize checks; noise images are PNG's worst case, so
    # this bounds real-scene decode cost from below.
    if on_tpu and _remaining() > 240:
        try:
            import tempfile

            from boxfusion_tpu.data.readers import CA1MDataset, write_ca1m_sequence
            from boxfusion_tpu.native import Prefetcher

            io_dir = os.path.join(
                tempfile.gettempdir(), f"bfio_seq_{S}_{n_frames}"
            )
            # completion marker: an interrupted earlier write (rgb present,
            # poses/K missing) must be rewritten, and a workload-shape change
            # invalidates the cache (ADVICE r3)
            marker = os.path.join(io_dir, ".complete.json")
            want = {"S": S, "n_frames": n_frames, "layout": 1}
            have = None
            try:
                with open(marker) as fh:
                    have = json.load(fh)
            except (OSError, ValueError):
                pass
            if have != want:
                _log("writing CA-1M layout sequence to disk")
                write_ca1m_sequence(frames, io_dir)
                with open(marker, "w") as fh:
                    json.dump(want, fh)
            cfg_io = _bench_cfg()
            cfg_io["data"]._data["datadir"] = io_dir
            cfg_io["data"]._data["start"] = 0
            # reader size is (w, h): frames are landscape 512x384
            cfg_io["cam"]._data["H"] = S
            cfg_io["cam"]._data["W"] = int(0.75 * S)
            cfg_io["cam"]._data["png_depth_scale"] = 1000.0
            # same shapes as the headline frames -> the fused program is
            # already compiled; re-validate on a short warmup then time
            ds = CA1MDataset(cfg_io)
            for i, fr in enumerate(ds):
                if i % gap == 0:
                    real_pipe.process_keyframe(fr)
                real_pipe.count += 1
                if i >= gap:
                    break
            real_pipe.flush()
            jax.block_until_ready(real_pipe.state.n)
            io_runs = []
            for _ in range(n_runs):
                real_pipe.reset()
                # the prefetcher is constructed INSIDE the timed window so its
                # queue pre-fill (up to 8 frames of disk read + PNG decode)
                # counts toward the I/O-inclusive figure (ADVICE r3)
                t_io = time.perf_counter()
                real_pipe.run(
                    Prefetcher(CA1MDataset(cfg_io), depth=8),
                    gap=gap, export=False,
                )
                io_runs.append(real_pipe.count / (time.perf_counter() - t_io))
            result["io_inclusive_fps_ca1m_layout"] = round(
                float(np.median(io_runs)), 3
            )
            _emit(result)
            _log(
                "io secondary done: "
                f"{result['io_inclusive_fps_ca1m_layout']:.1f} FPS"
            )
        except Exception as e:  # noqa: BLE001
            _log(f"io-inclusive secondary skipped: {e}")
    elif on_tpu:
        _log(f"io secondary skipped: {_remaining():.0f}s left of deadline")

    # --- final: single end-of-bench export (sanity: the timed runs really
    # kept boxes); safe here because no timing follows the D2H.  Exports the
    # last HEADLINE run's state -- the saturation figures must describe the
    # workload the headline FPS was measured on, not the side profiles.
    from boxfusion_tpu.runtime.device_state import export_world

    world = export_world(headline_state, class_list=real_pipe.class_list)
    world_stats = {k: int(v) for k, v in world["stats"].items()}
    result.update(
        {
            # no-silent-caps: the HEADLINE profile is sized to NOT saturate
            # (expected dropped_world_capacity == 0 and label_overflow == 0
            # in these stats); the 256-slot/32-crop saturating configuration
            # lives on as stress/multistream secondaries
            "world_boxes_final_run": int(world["scores"].shape[0]),
            "world_stats_final_run": world_stats,
            "headline_saturated": bool(
                world_stats.get("dropped_world_capacity", 0)
                or world_stats.get("label_overflow", 0)
            ),
            "bench_wall_s": round(time.monotonic() - _T0, 1),
        }
    )
    _emit(result)
    _log("bench complete")


if __name__ == "__main__":
    main()

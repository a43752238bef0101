"""End-to-end benchmark: online detection + fusion FPS at CA-1M scale.

Architecture: a PURE-HOST parent process (never initializes JAX) drives a
sequence of measurement PHASES, each in a killable subprocess with its own
timeout.  The tunneled TPU backend sometimes hangs outright inside a
blocking PJRT call (docs/TUNNEL_PERF_NOTES.md) -- round 3's bench and the
first round-4 validation run both hung that way, losing everything.  With
phase isolation a hang costs exactly one phase's timeout; every figure
already measured survives, because:

  * each phase appends its figures incrementally to a JSON result file
    (rewritten atomically after every measurement inside the phase);
  * the parent merges phase results and prints the accumulated JSON line
    after every phase -- the LAST parseable stdout line is the record, and
    each emission is mirrored to BENCH_partial.json;
  * the whole bench runs under an internal deadline (BENCH_DEADLINE_S env,
    default 1500 s); later phases are skipped once it is near.

Phases (each also logs timestamped progress to stderr):
  micro     -- CuTR-768 bf16 forward microbench: device ms, analytic FLOPs,
               TFLOP/s, MFU vs the device-kind table peak AND vs a measured
               bf16 matmul ceiling probed on the same chip.  Emits a
               PRELIMINARY metric so even a headline hang leaves a record.
  headline  -- the real path (the RECORD): posed RGB-D stream at CA-1M
               resolution (512x384), keyframe gap 20; per keyframe ONE
               fused device program (runtime/fused.py) runs CuTR ViT-B/16
               RGB-D detection, open-vocab CLIP ViT-L/14 labeling, and the
               device-resident association + 1024-particle multi-view PST
               fusion step (mirroring the reference's per-keyframe stages
               demo.py:136-171,262-305).  Random weights (identical FLOPs
               to converted checkpoints), host-generated synthetic stream.
               Sized NOT to saturate (2048-slot world, 128-crop label
               budget): every surviving detection gets a world slot, a CLIP
               label and an observation-bank entry -- asserted via the
               end-of-phase stats export (headline_saturated).  Also
               measures the gap=1 live-SLAM profile (cubicle.yaml:7) and,
               budget permitting, the I/O-inclusive figure (the same fused
               pipeline fed from an on-disk CA-1M layout through the native
               C++ PNG decoder + threaded prefetcher -- the figure the
               reference's own FPS print includes, demo.py:363-366).
  multistream -- 4 independent sequences in lockstep on one chip
               (runtime/batched.py, packed transport): aggregate frames/s.
  stages    -- completion-forced per-stage keyframe cost table (stage_ms):
               CLIP tower per label bucket, crop+resize, association step,
               fusion delta -- the decomposition that directs the next cut.
  stress    -- oracle-detection association/fusion stress load at the
               production 256-slot profile (deliberately saturating).

vs_baseline: the reference publishes no FPS (BASELINE.md); the paper-level
claim for the CUDA pipeline is ~10 FPS end-to-end on a desktop GPU
(including real dataset I/O, which the headline excludes but the
io_inclusive secondary pays), so vs_baseline = value / 10.0 is an
ESTIMATE, labeled as such.

MEASUREMENT PROTOCOL (round 4, completion-forced).  The tunneled backend
DEFERS real execution of most programs until a result is observed:
``jax.block_until_ready`` returns in microseconds while the actual compute
has not run (measured: 20 "blocked" CuTR forwards completed in 5.8 ms; the
first following D2H fetch stalled 49 s doing the real work --
docs/TUNNEL_PERF_NOTES.md "The relay defers execution").  Every number
this bench ever produced through the old D2H-free protocol was therefore
an ENQUEUE rate, not an execution rate (rounds 2-3 headline ~10,000 FPS;
truthfully ~60-70).  Every timed window now (a) warms up with a fetch so
the process is already in the truthful regime, and (b) ends with a small
scalar D2H (the chained eps, or ``int(state.n)``) INSIDE the window, so
nothing can be deferred past the clock.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

_T0 = time.monotonic()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "1500"))
_HERE = os.path.dirname(os.path.abspath(__file__))
_PARTIAL_PATH = os.path.join(_HERE, "BENCH_partial.json")


def _remaining() -> float:
    return _DEADLINE_S - (time.monotonic() - _T0)


def _log(msg: str) -> None:
    print(f"bench[{time.monotonic() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _write_json(path: str, d: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(json.dumps(d) + "\n")
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# shared measurement setup (used inside phase subprocesses only)
# ---------------------------------------------------------------------------

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


def _phase_init():
    """Common subprocess start: honor JAX_PLATFORMS (the axon sitecustomize
    pre-registers the TPU backend; the env var alone does not flip to CPU),
    enable the persistent compile cache, and report the backend."""
    import jax

    p = os.environ.get("JAX_PLATFORMS")
    if p:
        jax.config.update("jax_platforms", p)
    from boxfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    on_tpu = jax.default_backend() not in ("cpu",)
    return jax, on_tpu


def _workload(on_tpu: bool) -> dict:
    return dict(
        dim=768 if on_tpu else 192,
        S=512 if on_tpu else 256,
        r=1 if on_tpu else 4,
        n_frames=400 if on_tpu else 40,
        gap=20,
        n_runs=3 if on_tpu else 2,
        dtype_tag="bf16" if on_tpu else "f32",
    )


def _build_model(on_tpu: bool, wl: dict):
    """CuTR model + random params with the class bias calibrated so the
    association/fusion/labeling stages see a realistic detection load."""
    import jax
    import jax.numpy as jnp

    from boxfusion_tpu.models.cutr import FrameBatch, make_cutr

    dim, S, r = wl["dim"], wl["S"], wl["r"]
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
    # every per-layer class head puts a heavy detection load above the
    # filter -- re-measured r5: median 100 of 100 rows/keyframe pass (min
    # 76), i.e. the label/association stages run at their full budget
    # nearly every keyframe.  FLOPs are unchanged.
    def _lift_bias(path, leaf):
        keys = [getattr(p, "key", "") for p in path]
        if any("class_predictor" in k for k in keys) and keys[-1] == "bias":
            return leaf + 3.2
        return leaf

    params = jax.tree_util.tree_map_with_path(_lift_bias, params)
    return model, params, batch


def _bench_cfg(on_tpu: bool, wl: dict):
    from boxfusion_tpu.utils.config import load_config

    c = load_config(os.path.join(_HERE, "config/ca1m.yaml"))
    c["data"]._data["gap"] = wl["gap"]
    c["detection"]._data["score_thresh"] = 0.3
    c["detection"]._data["uv_bound"] = False
    c["detection"]._data["floor_mask"] = False
    c["box_fusion"]._data["pst_path"] = None
    if not on_tpu:
        c["box_fusion"]._data["pst_size"] = 256
        c["box_fusion"]._data["max_fusions_per_frame"] = 4
        c["association"]._data["max_views"] = 5
    return c


def _make_labeler(on_tpu: bool):
    """CLIP image tower at ViT-L/14 scale (the fork's active image model,
    reference demo.py:459) with the reference's 473-class text features."""
    import jax.numpy as jnp

    from boxfusion_tpu.models.clip.head import OpenVocabLabeler
    from boxfusion_tpu.models.clip.model import CLIPConfig

    if on_tpu:
        clip_cfg = CLIPConfig(
            patch=14, width=1024, layers=24, heads=16, embed_dim=1024,
            dtype=jnp.bfloat16, quick_gelu=True,  # OpenAI ViT-L/14 is
            # a quickgelu model (open_clip ViT-L-14-quickgelu); sigmoid is
            # also measurably cheaper than erf on the VPU
        )
        n_classes, feat_dim = 473, 1024
    else:
        clip_cfg = CLIPConfig(
            patch=32, width=64, layers=2, heads=2, embed_dim=32,
            vocab_size=64, context_length=8, text_width=64, text_layers=1,
            text_heads=2,
        )
        n_classes, feat_dim = 8, 32
    text_features = np.random.RandomState(1).randn(
        n_classes, feat_dim
    ).astype(np.float32)
    classes = [f"class{i}" for i in range(n_classes)]
    return OpenVocabLabeler(classes, text_features, cfg=clip_cfg).init_random(0)


def _frames(wl: dict):
    from boxfusion_tpu.data.synthetic import SyntheticSequence

    seq = SyntheticSequence(
        n_frames=wl["n_frames"], n_boxes=8,
        image_hw=(int(0.75 * wl["S"]), wl["S"]), seed=0,
    )
    return seq, list(seq)  # materialize: synthesis is not pipeline work


# ---------------------------------------------------------------------------
# phase: micro (detector microbench + measured matmul ceiling)
# ---------------------------------------------------------------------------

def _measure_matmul_peak(on_tpu: bool) -> tuple:
    """Measured-achievable bf16 matmul TFLOP/s on the attached chip.

    Round 2's detector "sustained 792 TFLOP/s vs the claimed v5e 197 peak"
    -- round 4 exposed that as the relay's DEFERRED-execution fiction, not
    newer silicon (module docstring).  The ceiling is still measured
    directly rather than trusted from the device_kind table, now under the
    completion-forced protocol: a jitted chain of large square bf16 matmuls
    with a hard data dependency between every matmul AND every dispatch,
    warmed up with a fetch and closed by a fetch inside the timed window.
    A cheap O(n^2) renormalize per step keeps values finite without
    touching the O(n^3) term.  MFU is reported against THIS number
    (detector_mfu_vs_measured_peak).  Fetch-forced r4 measurement:
    172-175 TFLOP/s -- 89% of the v5e table peak, i.e. the self-reported
    chip kind is real.
    """
    import jax
    import jax.numpy as jnp

    n, inner, reps = (8192, 8, 10) if on_tpu else (512, 2, 2)
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    # HOST RNG + device_put: on-device jax.random generation of the 8192^2
    # operands added minutes of compile+run on the tunnel (the round-4
    # micro-phase "hang" was exactly this, not a hang)
    rng = np.random.RandomState(7)
    w = jax.device_put(rng.randn(n, n).astype(np.float32) / np.sqrt(n)).astype(dt)
    x0 = jax.device_put(rng.randn(n, n).astype(np.float32)).astype(dt)

    @jax.jit
    def chain(x):
        for _ in range(inner):  # unrolled on purpose -- see docstring
            y = x @ w
            x = (y * (1.0 / (jnp.max(jnp.abs(y)).astype(jnp.float32) + 1e-6))).astype(dt)
        return x

    x = chain(x0)
    float(jnp.sum(x.astype(jnp.float32)))  # truthful-mode warmup fetch
    t0 = time.perf_counter()
    for _ in range(reps):
        x = chain(x)
    float(jnp.sum(x.astype(jnp.float32)))  # completion fetch INSIDE window
    elapsed = time.perf_counter() - t0
    tflops_per_s = reps * inner * 2.0 * float(n) ** 3 / elapsed / 1e12
    return tflops_per_s, n, inner


def phase_micro(out_path: str, budget_s: float) -> None:
    jax, on_tpu = _phase_init()
    import dataclasses as _dc

    import jax.numpy as jnp

    wl = _workload(on_tpu)
    result = {"on_tpu": on_tpu}
    _write_json(out_path, result)

    _log(f"micro: building CuTR-{wl['dim']} ({wl['dtype_tag']})")
    model, params, batch = _build_model(on_tpu, wl)
    fwd = jax.jit(model.apply)
    jax.block_until_ready(fwd(params, batch))  # compile
    _log("micro: CuTR forward compiled")

    # back-to-back dispatches with a DATA DEPENDENCY chaining each rep to
    # the previous output, and -- the round-4 correction -- a scalar FETCH
    # of the dependency inside the timed window.  Without the fetch the
    # relay defers real execution and block_until_ready returns in
    # microseconds (module docstring): the old protocol recorded 0.29 ms
    # per forward where the truthful cost is ~5 ms.
    @jax.jit
    def chained(params, batch, eps):
        out = model.apply(params, _dc.replace(batch, image=batch.image + eps))
        # dependency scalar folds in EVERY output so XLA cannot dead-code-
        # eliminate any head (flops counted below are of this same program)
        dep = sum(jnp.sum(v).astype(jnp.float32) for v in jax.tree.leaves(out))
        # the +1e-3 keeps every execution's input genuinely unique
        return dep * 1e-12 + eps + 1e-3

    reps = 50
    eps = chained(params, batch, jnp.float32(0.0))
    float(eps)  # compile + flip the process into the truthful regime
    _log("micro: chained program compiled; timing")
    t0 = time.perf_counter()
    for _ in range(reps):
        eps = chained(params, batch, eps)
    float(eps)  # completion fetch INSIDE the window
    det_ms = (time.perf_counter() - t0) / reps * 1e3
    _log(f"micro: detector {det_ms:.2f} ms/forward; counting FLOPs")
    det_flops = _compiled_flops(chained, params, batch, jnp.float32(0.0))
    tflops_per_s = det_flops / (det_ms * 1e-3) / 1e12 if det_flops else 0.0
    peak, chip = _chip_peak_tflops(jax.devices()[0])
    mfu = tflops_per_s / peak if tflops_per_s else 0.0

    result.update(
        {
            # PRELIMINARY record in case the headline never lands: the
            # detector-only figure.  Overwritten by the headline phase.
            "metric": (
                f"CuTR-{wl['dim']} {wl['dtype_tag']} detector forward @ "
                f"{wl['S']}px (PRELIMINARY -- headline e2e FPS pending)"
            ),
            "value": round(1000.0 / det_ms, 3),
            "unit": "forwards/s",
            "vs_baseline": round((1000.0 / det_ms) / 10.0, 3),
            "detector_ms": round(det_ms, 3),
            "detector_gflops": round(det_flops / 1e9, 1),
            "detector_tflops_per_s": round(tflops_per_s, 2),
            "detector_mfu": round(mfu, 4),
            "chip": chip,
            "chip_peak_tflops_bf16": peak,
        }
    )
    _write_json(out_path, result)

    _log("micro: probing measured bf16 matmul ceiling")
    measured_peak, probe_n, probe_inner = _measure_matmul_peak(on_tpu)
    mfu_measured = tflops_per_s / measured_peak if measured_peak else 0.0
    result.update(
        {
            # measured ceiling: chained large bf16 matmul on this chip
            # (the honest MFU denominator; see _measure_matmul_peak)
            "measured_peak_tflops_bf16_matmul": round(measured_peak, 2),
            "matmul_probe_shape": f"{probe_n}x{probe_n}x{probe_n} x{probe_inner}",
            "detector_mfu_vs_measured_peak": round(mfu_measured, 4),
        }
    )
    if mfu > 1.0:
        result["mfu_note"] = (
            f"IMPOSSIBLE: detector {tflops_per_s:.0f} TFLOP/s exceeds the "
            f"{peak:.0f} TFLOP/s bf16 table peak of '{chip}' -- under the "
            "completion-forced protocol this indicates the relay deferred "
            "execution anyway; treat this phase's figures as invalid"
        )
    _write_json(out_path, result)
    _log(
        f"micro: done ({det_ms:.2f} ms, {tflops_per_s:.0f} TFLOP/s, "
        f"ceiling {measured_peak:.0f})"
    )


# ---------------------------------------------------------------------------
# phase: headline (+ gap=1 + io-inclusive + stats export)
# ---------------------------------------------------------------------------

def phase_headline(out_path: str, budget_s: float) -> None:
    jax, on_tpu = _phase_init()
    t_phase = time.monotonic()

    from boxfusion_tpu.runtime.detector import CuTRDetector
    from boxfusion_tpu.runtime.fused import FusedDevicePipeline

    wl = _workload(on_tpu)
    S, gap, n_frames, n_runs = wl["S"], wl["gap"], wl["n_frames"], wl["n_runs"]
    result = {}

    _log("headline: building CuTR + CLIP")
    model, params, batch = _build_model(on_tpu, wl)
    labeler = _make_labeler(on_tpu)
    _seq, frames = _frames(wl)

    # headline profile: sized so NOTHING saturates at this detection rate
    # (~40-100 raw/keyframe x 21 keyframes): every surviving detection gets
    # a world slot, a CLIP label, and an observation-bank entry.  Capacity
    # 2048 compiles fast since the unrolled-NMS chains are bounded by
    # StepConfig.max_nms_sweeps/max_nms_records, not capacity
    # (device_step.py) -- round 3's capacity-length unroll was a compile
    # blowup.
    cfg_headline = _bench_cfg(on_tpu, wl)
    headline_capacity = 2048 if on_tpu else 256
    if on_tpu:
        cfg_headline["detection"]._data["max_label_boxes"] = 128
        cfg_headline["association"]._data["max_observations"] = 16384

    real_pipe = FusedDevicePipeline(
        cfg_headline, CuTRDetector(model, params), labeler=labeler,
        capacity=headline_capacity,
    )

    # warmup compiles the fused program (persistent-cached) AND flips the
    # process into the truthful regime with a fetch; timed runs reset +
    # reuse the pipeline (fresh state, cached executables)
    _log("headline: compiling fused keyframe program")
    for i, frame in enumerate(frames[: 2 * gap + 1]):
        if i % gap == 0:
            real_pipe.process_keyframe(frame)
        real_pipe.count += 1
    real_pipe.flush()
    int(real_pipe.state.n)  # truthful-mode warmup fetch (module docstring)
    _log("headline: fused program compiled; timing")

    def _timed_run(pipe, seq_frames, g):
        """One externally-timed run with the completion fetch INSIDE the
        window -- pipe.fps (set by run()) excludes the fetch and would
        report the relay's enqueue rate, not execution (module docstring)."""
        pipe.reset()
        t0 = time.perf_counter()
        pipe.run(seq_frames, gap=g, export=False)
        int(pipe.state.n)  # forces real completion of the whole chain
        return len(seq_frames) / (time.perf_counter() - t0)

    real_runs = [_timed_run(real_pipe, frames, gap) for _ in range(n_runs)]
    real_fps = float(np.median(real_runs))

    # hold the LAST HEADLINE run's final state for the end-of-phase export
    headline_state = real_pipe.state

    result.update(
        {
            "metric": (
                f"online e2e FPS, real path: CuTR-{wl['dim']} {wl['dtype_tag']} "
                f"detect + CLIP label + device-resident assoc+fusion @ {S}px, "
                f"gap {gap}, one fused dispatch/keyframe (synthetic stream, "
                "random weights, class bias calibrated to a heavy ~100 raw "
                "detections/keyframe (measured: median 100 of 100 rows pass "
                "the 0.3 filter; the CLIP label stage therefore runs at its "
                "full 100-crop load most keyframes); non-saturating profile: "
                f"{headline_capacity}-slot world, "
                f"{int(cfg_headline['detection']['max_label_boxes'])}-crop "
                "label budget); COMPLETION-FORCED timing (in-window D2H "
                "barrier; earlier rounds' ~10k FPS was the relay's deferred-"
                "execution enqueue rate, see bench.py docstring)"
            ),
            "value": round(real_fps, 3),
            "unit": "frames/s",
            # ESTIMATE: paper-level ~10 FPS CUDA e2e claim, which includes
            # dataset I/O this headline excludes (no measured ref run exists;
            # see io_inclusive_fps_ca1m_layout for the I/O-paying figure).
            "vs_baseline": round(real_fps / 10.0, 3),
        }
    )
    _write_json(out_path, result)
    _log(f"headline: {real_fps:.1f} FPS (runs {[round(x, 1) for x in real_runs]})")

    # gap=1: keyframe EVERY frame (cubicle.yaml live-SLAM profile) --
    # detection+labeling+association+fusion per frame; same compiled program
    kf1_frames = frames[: n_frames // 4]
    for fr in kf1_frames[:3]:
        real_pipe.process_keyframe(fr)
        real_pipe.count += 1
    real_pipe.flush()
    int(real_pipe.state.n)
    n_sec = min(n_runs, 2)  # secondaries: 2 runs keep the phase inside budget
    kf1_runs = [_timed_run(real_pipe, kf1_frames, 1) for _ in range(n_sec)]
    result["keyframes_per_s_gap1"] = round(float(np.median(kf1_runs)), 3)
    _write_json(out_path, result)
    _log(f"headline: gap=1 {result['keyframes_per_s_gap1']:.1f} keyframes/s")

    # I/O-inclusive figure (same fused pipeline fed from disk).  The
    # reference's printed FPS (demo.py:363-366) INCLUDES dataset I/O: its
    # loop decodes a png/jpg pair from disk for every frame
    # (capture_stream.py:194-206,452-460).  Noise images are PNG's decode
    # worst case, so this bounds real-scene I/O-inclusive FPS from below.
    phase_left = budget_s - (time.monotonic() - t_phase)
    if on_tpu and phase_left > 180:
        try:
            import tempfile

            from boxfusion_tpu.data.readers import CA1MDataset, write_ca1m_sequence
            from boxfusion_tpu.native import Prefetcher

            io_dir = os.path.join(tempfile.gettempdir(), f"bfio_seq_{S}_{n_frames}")
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
                _log("headline: writing CA-1M layout sequence to disk")
                write_ca1m_sequence(frames, io_dir)
                with open(marker, "w") as fh:
                    json.dump(want, fh)
            cfg_io = _bench_cfg(on_tpu, wl)
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
            for _ in range(min(n_runs, 2)):
                real_pipe.reset()
                # the prefetcher is constructed INSIDE the timed window so its
                # queue pre-fill (up to 8 frames of disk read + PNG decode)
                # counts toward the I/O-inclusive figure (ADVICE r3)
                t_io = time.perf_counter()
                real_pipe.run(
                    Prefetcher(CA1MDataset(cfg_io), depth=8),
                    gap=gap, export=False,
                )
                int(real_pipe.state.n)  # completion fetch INSIDE the window
                io_runs.append(real_pipe.count / (time.perf_counter() - t_io))
            result["io_inclusive_fps_ca1m_layout"] = round(
                float(np.median(io_runs)), 3
            )
            _write_json(out_path, result)
            _log(
                "headline: io-inclusive "
                f"{result['io_inclusive_fps_ca1m_layout']:.1f} FPS"
            )
        except Exception as e:  # noqa: BLE001
            _log(f"headline: io-inclusive skipped: {e}")
    elif on_tpu:
        _log(f"headline: io-inclusive skipped ({phase_left:.0f}s phase budget left)")

    # chunk=8 throughput mode: scan 8 keyframes per dispatch
    # (make_fused_chunk_fn), amortizing per-keyframe host dispatch cost --
    # identical decisions (parity:
    # tests/test_fused_pipeline.py::test_chunked_matches_per_frame_dispatch),
    # 8 keyframes of result latency.  The r5 A/B shows chunking winning at
    # EVERY gap (gap=20 108.2 vs 93.1 FPS, gap=1 6.3 vs 4.9 keyframes/s --
    # the ~40 ms per-dispatch host+tunnel cost dominates the shrunken
    # per-keyframe program), which is why the former gap>chunk
    # auto-disable was removed from the engine.  The headline `value`
    # stays the per-keyframe (chunk=1) figure for cross-round
    # comparability; fps_chunk8 records the recommended throughput config.
    phase_left = budget_s - (time.monotonic() - t_phase)
    if phase_left > 120:
        chunk_pipe = FusedDevicePipeline(
            cfg_headline, CuTRDetector(model, params), labeler=labeler,
            capacity=headline_capacity, chunk=8, chunk_auto=False,
        )
        for fr in kf1_frames[:9]:
            chunk_pipe.process_keyframe(fr)
            chunk_pipe.count += 1
        chunk_pipe.flush()
        int(chunk_pipe.state.n)  # compile + truthful-mode fetch
        kf1c_runs = [_timed_run(chunk_pipe, kf1_frames, 1)
                     for _ in range(min(n_runs, 2))]
        fpsc_runs = [_timed_run(chunk_pipe, frames, gap)
                     for _ in range(min(n_runs, 2))]
        result["keyframes_per_s_gap1_chunk8"] = round(
            float(np.median(kf1c_runs)), 3
        )
        result["fps_chunk8"] = round(float(np.median(fpsc_runs)), 3)
        _write_json(out_path, result)
        _log(
            "headline: chunk=8 "
            f"gap=1 {result['keyframes_per_s_gap1_chunk8']:.1f} keyframes/s, "
            f"gap={gap} {result['fps_chunk8']:.1f} FPS"
        )
    else:
        _log(f"headline: chunk=8 skipped ({phase_left:.0f}s left)")

    # single end-of-phase export (sanity: the timed runs really kept boxes).
    # Exports the last HEADLINE run's state -- the saturation figures must
    # describe the workload the headline FPS was measured on, not the side
    # profiles.  The export runs on a WATCHDOG thread: a large D2H over the
    # tunnel can still stall (the round-4 "export hang" was the relay
    # draining its deferred queue -- with in-window fetches that backlog is
    # gone, but the guard is kept); a hung export must cost this phase its
    # stats fields, never the already-written FPS figures (the daemon
    # thread dies with the process; phases exit via os._exit, so no
    # shutdown hang either).
    import threading

    from boxfusion_tpu.runtime.device_state import export_world

    box = {}

    def _export():
        box["world"] = export_world(
            headline_state, class_list=real_pipe.class_list
        )

    th = threading.Thread(target=_export, daemon=True)
    th.start()
    th.join(timeout=120.0)
    world = box.get("world")
    if world is None:
        result["export_hung"] = True
        _write_json(out_path, result)
        _log("headline: WORLD EXPORT HUNG (>120s); stats fields skipped")
        return
    world_stats = {k: int(v) for k, v in world["stats"].items()}
    result.update(
        {
            # no-silent-caps: the HEADLINE profile is sized to NOT saturate
            # (expected dropped_world_capacity == 0 and label_overflow == 0
            # in these stats); the 256-slot/32-crop saturating configuration
            # lives on as the stress/multistream phases
            "world_boxes_final_run": int(world["scores"].shape[0]),
            "world_stats_final_run": world_stats,
            "headline_saturated": bool(
                world_stats.get("dropped_world_capacity", 0)
                or world_stats.get("label_overflow", 0)
            ),
        }
    )
    _write_json(out_path, result)
    _log("headline: done (stats exported)")


# ---------------------------------------------------------------------------
# phase: stages (per-stage keyframe cost decomposition -> stage_ms)
# ---------------------------------------------------------------------------

def phase_stages(out_path: str, budget_s: float) -> None:
    """Completion-forced per-stage costs of the real keyframe path:
    detector forward, crop+resize, CLIP tower at each label bucket, and the
    association/fusion step (oracle load, headline capacity) with fusion
    on/off.  Each figure is a serialized dependency chain closed by a
    scalar fetch inside the timed window (module docstring protocol)."""
    jax, on_tpu = _phase_init()
    import jax.numpy as jnp

    wl = _workload(on_tpu)
    result = {"stage_ms": {}}
    stage = result["stage_ms"]

    def timed_chain(fn, x0, reps):
        """fn: x -> scalar-ish dependency; chains reps calls, fetches inside."""
        x = fn(x0)
        jax.block_until_ready(x)
        float(jnp.sum(x)) if hasattr(x, "dtype") else None  # warm fetch
        t0 = time.perf_counter()
        for _ in range(reps):
            x = fn(x)
        float(jnp.sum(x))
        return (time.perf_counter() - t0) / reps * 1e3

    # --- CLIP tower per label bucket + crop/resize ---------------------------
    _log("stages: CLIP tower per bucket")
    labeler = _make_labeler(on_tpu)
    from boxfusion_tpu.models.clip.head import batched_crop_resize
    from boxfusion_tpu.runtime.fused import label_buckets_for

    rng = np.random.RandomState(0)
    S = wl["S"]
    image = jnp.asarray(rng.rand(int(0.75 * S), S, 3) * 255, jnp.float32)
    buckets = [b for b in label_buckets_for(128 if on_tpu else 32) if b > 0]
    reps = 6 if on_tpu else 2
    tower = jax.jit(labeler.tower.apply)
    for b in buckets:
        crops0 = jnp.asarray(rng.rand(b, 224, 224, 3), jnp.float32)

        def step_tower(x, _crops0=crops0, _b=b):
            feats = tower(labeler.params, _crops0 + jnp.mean(x) * 1e-12)
            return jnp.sum(feats.astype(jnp.float32), axis=0)

        stage[f"clip_tower_{b}"] = round(
            timed_chain(step_tower, jnp.zeros(labeler.text_features.shape[1]), reps), 3
        )
        _write_json(out_path, result)
        _log(f"stages: clip_tower_{b} = {stage[f'clip_tower_{b}']} ms")

    boxes = jnp.asarray(rng.rand(128, 4) * 150 + 5, jnp.float32)
    boxes = boxes.at[:, 2:].add(boxes[:, :2])
    cr = jax.jit(lambda img, b: batched_crop_resize(img, b))

    def step_crop(x):
        crops = cr(image + jnp.mean(x) * 1e-12, boxes)
        return jnp.sum(crops, axis=(0, 1, 2))

    stage["crop_resize_128"] = round(
        timed_chain(step_crop, jnp.zeros(3), reps), 3
    )
    _write_json(out_path, result)

    # --- association + fusion step (oracle load, headline profile) ----------
    _log("stages: keyframe step (assoc+fusion) oracle load")
    from boxfusion_tpu.data.synthetic import OracleDetector
    from boxfusion_tpu.runtime.device_pipeline import DevicePipeline

    seq, frames = _frames(wl)
    capacity = 2048 if on_tpu else 256
    for tag, fuse_on in (("assoc_plus_fusion", True), ("assoc_only", False)):
        cfg = _bench_cfg(on_tpu, wl)
        cfg["box_fusion"]._data["use"] = fuse_on
        if on_tpu:
            cfg["association"]._data["max_observations"] = 16384
        pipe = DevicePipeline(
            cfg, OracleDetector(seq, noise=0.03, seed=1), capacity=capacity
        )
        kf = frames[:: wl["gap"]][: 21 if on_tpu else 6]
        for fr in kf[:2]:
            pipe.process_keyframe(fr)
        pipe.flush()
        int(pipe.state.n)  # compile + truthful-mode fetch
        best = None
        for _ in range(2):
            pipe.reset()
            pipe.detector = OracleDetector(seq, noise=0.03, seed=1)
            t0 = time.perf_counter()
            for fr in kf:
                pipe.process_keyframe(fr)
            pipe.flush()
            int(pipe.state.n)  # completion fetch INSIDE the window
            dt = (time.perf_counter() - t0) / len(kf) * 1e3
            best = dt if best is None else min(best, dt)
        stage[f"step_{tag}"] = round(best, 3)
        _write_json(out_path, result)
        _log(f"stages: step_{tag} = {stage[f'step_{tag}']} ms/keyframe")
    stage["fusion_delta"] = round(
        max(stage["step_assoc_plus_fusion"] - stage["step_assoc_only"], 0.0), 3
    )
    _write_json(out_path, result)
    _log("stages: done")


# ---------------------------------------------------------------------------
# phase: stress (oracle-detection association/fusion load)
# ---------------------------------------------------------------------------

def phase_stress(out_path: str, budget_s: float) -> None:
    jax, on_tpu = _phase_init()

    from boxfusion_tpu.data.synthetic import OracleDetector
    from boxfusion_tpu.runtime.device_pipeline import DevicePipeline

    wl = _workload(on_tpu)
    gap, n_runs = wl["gap"], wl["n_runs"]
    result = {}

    _log("stress: building CuTR")
    model, params, batch = _build_model(on_tpu, wl)
    fwd = jax.jit(model.apply)
    jax.block_until_ready(fwd(params, batch))
    seq, frames = _frames(wl)
    cfg = _bench_cfg(on_tpu, wl)

    class BenchDetector:
        """Enqueues the real CuTR forward (its device time serializes into
        the measured stream), returns oracle detections so association and
        fusion see a deterministic, high-occupancy box load."""

        def __init__(self):
            self.oracle = OracleDetector(seq, noise=0.03, seed=1)

        def __call__(self, frame):
            fwd(params, batch)  # async; lands in the timed stream
            return self.oracle(frame)

    stress_pipe = DevicePipeline(cfg, BenchDetector(), capacity=256)
    _log("stress: compiling keyframe step")
    for i, frame in enumerate(frames[: 2 * gap + 1]):
        if i % gap == 0:
            stress_pipe.process_keyframe(frame)
        stress_pipe.count += 1
    stress_pipe.flush()
    int(stress_pipe.state.n)  # compile + truthful-mode fetch
    _log("stress: compiled; timing")

    stress_runs = []
    for _ in range(n_runs):
        stress_pipe.reset()
        # fresh oracle per run: its RNG is consumed per call, and runs must
        # measure an identical detection workload
        stress_pipe.detector = BenchDetector()
        t0 = time.perf_counter()
        stress_pipe.run(frames, gap=gap, export=False)
        int(stress_pipe.state.n)  # completion fetch INSIDE the window
        stress_runs.append(len(frames) / (time.perf_counter() - t0))
    result["stress_fps_oracle_load"] = round(float(np.median(stress_runs)), 3)
    _write_json(out_path, result)
    _log(f"stress: done ({result['stress_fps_oracle_load']:.1f} FPS)")


# ---------------------------------------------------------------------------
# phase: multistream (4 lanes in lockstep on one chip)
# ---------------------------------------------------------------------------

def phase_multistream(out_path: str, budget_s: float) -> None:
    jax, on_tpu = _phase_init()

    from boxfusion_tpu.data.synthetic import SyntheticSequence
    from boxfusion_tpu.runtime.batched import BatchedPipeline
    from boxfusion_tpu.runtime.detector import CuTRDetector

    wl = _workload(on_tpu)
    S, gap, n_runs = wl["S"], wl["gap"], wl["n_runs"]
    result = {}

    _log("multistream: building CuTR + CLIP")
    model, params, _batch = _build_model(on_tpu, wl)
    labeler = _make_labeler(on_tpu)
    cfg = _bench_cfg(on_tpu, wl)
    lane_seqs = [
        list(SyntheticSequence(
            n_frames=wl["n_frames"] // 2, n_boxes=8,
            image_hw=(int(0.75 * S), S), seed=10 + s,
        ))
        for s in range(4)
    ]
    bp = BatchedPipeline(
        cfg, CuTRDetector(model, params), n_lanes=4, capacity=256,
        transport="packed", labeler=labeler,
    )
    _log("multistream: compiling batched programs")
    bp.run(lane_seqs, gap=gap, export=False)  # warmup compile
    int(np.asarray(bp.states.n).sum())  # truthful-mode fetch
    _log("multistream: compiled; timing")
    n_frames_total = sum(len(s) for s in lane_seqs)
    ms_runs = []
    for _ in range(n_runs):
        bp.reset()
        t0 = time.perf_counter()
        bp.run(lane_seqs, gap=gap, export=False)
        int(np.asarray(bp.states.n).sum())  # completion fetch in window
        ms_runs.append(n_frames_total / (time.perf_counter() - t0))
    result["multistream_fps_4lanes_packed"] = round(float(np.median(ms_runs)), 3)
    _write_json(out_path, result)
    _log(
        "multistream: done "
        f"({result['multistream_fps_4lanes_packed']:.1f} FPS aggregate)"
    )


_PHASES = {
    "micro": phase_micro,
    "headline": phase_headline,
    "stages": phase_stages,
    "stress": phase_stress,
    "multistream": phase_multistream,
}


# ---------------------------------------------------------------------------
# parent orchestration (pure host -- never initializes JAX, cannot hang)
# ---------------------------------------------------------------------------

def _probe_backend_alive(timeout_s: float = 55.0, attempts: int = 3) -> None:
    """The tunneled backend sometimes hangs outright (a tiny op never
    returns, 0% CPU -- docs/TUNNEL_PERF_NOTES.md), so probe it in a
    KILLABLE subprocess first.  Total probe budget ~3 min (round 3's
    6 x 120 s budget could burn >13 minutes before any measurement)."""
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


def _run_phase(name: str, timeout_s: float) -> dict:
    """Run one phase in a killable subprocess; return whatever figures it
    managed to write (possibly {} on a timeout before the first figure)."""
    out_path = os.path.join(_HERE, f".bench_phase_{name}.json")
    try:
        os.remove(out_path)
    except OSError:
        pass
    _log(f"phase {name}: starting (timeout {timeout_s:.0f}s)")
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", name,
             "--out", out_path, "--budget", str(timeout_s)],
            timeout=timeout_s,
        )
        if proc.returncode != 0:
            _log(f"phase {name}: exited rc={proc.returncode}")
    except subprocess.TimeoutExpired:
        _log(f"phase {name}: TIMED OUT after {timeout_s:.0f}s (killed; "
             "keeping its partial figures)")
    try:
        with open(out_path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _emit(result: dict) -> None:
    """Print the accumulated figure set as ONE JSON line (stdout) and mirror
    it to BENCH_partial.json.  The driver keeps the last parseable line, so
    each emission supersedes the previous."""
    line = json.dumps(result)
    print(line, flush=True)
    try:
        with open(_PARTIAL_PATH, "w") as f:
            f.write(line + "\n")
    except OSError as e:  # a read-only checkout must not kill the bench
        _log(f"partial-file write failed: {e}")


def main() -> None:
    _probe_backend_alive()
    result: dict = {}

    # --- 1. micro: detector figures (fast; a PRELIMINARY record) ------------
    # the truthful-mode flip (first fetch after the chained-program compile)
    # can alone take ~4 min on the tunnel; 420 s truncated the phase in r4
    micro = _run_phase("micro", min(600.0, max(120.0, _remaining() - 600)))
    on_tpu = bool(micro.get("on_tpu", True))
    micro.pop("on_tpu", None)
    result.update(micro)
    if result:
        _emit(result)

    # --- 2. headline: THE record (+ gap1 + io + saturation stats) -----------
    # one retry on a hang/crash if the deadline allows: tunnel outages have
    # recovered within minutes, and the compile cache makes retries cheap
    for attempt in (1, 2):
        # the relay's first forced execution of a freshly-compiled program
        # can take ~10 min before any timing starts (TUNNEL_PERF_NOTES.md
        # round-4 correction); the phase self-gates its optional secondaries
        # on its remaining budget
        budget = min(1100.0, _remaining() - 60)
        if budget < 240:
            _log("headline: skipped (deadline)")
            break
        headline = _run_phase("headline", budget)
        if headline:
            result.update(headline)
            _emit(result)
        if "value" in headline and headline.get("unit") == "frames/s":
            break
        _log(f"headline: attempt {attempt} produced no FPS"
             + ("; retrying" if attempt == 1 and _remaining() > 300 else ""))
        if _remaining() <= 300:
            break

    # --- 3. multistream (before stress: the 4-lane aggregate had no r4
    # record -- stress does -- so it gets the earlier budget slot) ----------
    if on_tpu and _remaining() > 300:
        result.update(_run_phase("multistream", min(420.0, _remaining() - 120)))
        _emit(result)
    elif on_tpu:
        _log("multistream: skipped (deadline)")

    # --- 4. stages (per-stage keyframe decomposition) -----------------------
    if _remaining() > 240:
        result.update(_run_phase("stages", min(360.0, _remaining() - 90)))
        _emit(result)
    else:
        _log("stages: skipped (deadline)")

    # --- 5. stress ----------------------------------------------------------
    if _remaining() > 200:
        result.update(_run_phase("stress", min(300.0, _remaining() - 60)))
        _emit(result)
    else:
        _log("stress: skipped (deadline)")

    # like-for-like CPU reference comparison, when the black-box CLI parity
    # record exists (tools/run_blackbox_parity.py runs the reference's own
    # demo.py and our cli.py on the same on-disk sequence and host and
    # records both printed FPS) -- the only measured-vs-measured reference
    # ratio available (the reference publishes no numbers, BASELINE.md)
    try:
        with open(os.path.join(_HERE, "REF_CPU_PARITY.json")) as f:
            rec = json.load(f)
        result["vs_reference_cpu"] = rec.get("vs_reference_cpu")
        result["ref_cpu_parity"] = {
            "fps": rec.get("fps"),
            "vs_reference_cpu_host_engine":
                rec.get("vs_reference_cpu_host_engine"),
            "world_exact_frac": rec.get("world", {}).get("exact_frac"),
            "deterministic_regime": rec.get("deterministic_regime"),
        }
    except (OSError, ValueError):
        pass

    result["bench_wall_s"] = round(time.monotonic() - _T0, 1)
    _emit(result)
    _log("bench complete")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=sorted(_PHASES), default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--budget", type=float, default=600.0)
    args = ap.parse_args()
    if args.phase:
        _PHASES[args.phase](args.out, args.budget)
        # hard exit: a poisoned/hung PJRT client must not stall interpreter
        # shutdown -- every figure is already on disk via _write_json
        os._exit(0)
    else:
        main()

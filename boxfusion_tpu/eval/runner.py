"""Multi-sequence evaluation fan-out.

Capability target: the reference's batch-eval workflow -- one demo.py
invocation per val.txt sequence with skip-if-exists resume (demo.py:434-436)
-- plus the TPU-parallel fan-out SURVEY.md section 2 calls for: sequences
are embarrassingly parallel, so on a multi-device host each device runs its
own device-resident pipeline and sequences are scheduled round-robin (the
pipeline is PINNED to its device -- uploads happen on a worker thread where
a thread-local ``jax.default_device`` context would not apply); no
collectives are needed -- results are gathered as host pickles exactly like
the reference.

Two-phase structure: phase 1 streams every sequence with ``export=False``
and stashes each final ``DeviceState`` (a few MB of device arrays); phase 2
exports, pickles, and scores them all.  Rationale: on tunneled backends ANY
device-to-host readback of a computed buffer permanently degrades dispatch
(docs/TUNNEL_PERF_NOTES.md "D2H of computed buffers"), so a per-sequence
export would run every sequence after the first in the ~30x-degraded mode.
Deferring exports keeps the whole fan-out at full speed and costs only the
stashed states' device memory.
"""
from __future__ import annotations

import itertools
import os
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from boxfusion_tpu.geometry.boxes import box_corners


def _world_corners(world: Dict[str, np.ndarray]) -> np.ndarray:
    import jax.numpy as jnp

    if len(world["scores"]) == 0:
        return np.zeros((0, 8, 3), np.float32)
    return np.asarray(
        box_corners(jnp.asarray(world["xyzlhw"]), jnp.asarray(world["R"]))
    )


def _finalize_world(
    world: Dict, video_id: str, fps: float, seq, cfg,
    gt_provider: Optional[Callable], output_dir: Optional[str],
) -> Dict:
    """Phase-2 per-sequence work shared by both runners: capacity-overflow
    warning, result entry, optional GT attachment, reference-format pickle."""
    from boxfusion_tpu.utils.io import save_eval_pickle

    st = world["stats"]
    if st["dropped_world_capacity"] or st["dropped_obs_capacity"]:
        print(
            f"[eval] WARNING {video_id}: capacity overflow dropped "
            f"{st['dropped_world_capacity']} detections / "
            f"{st['dropped_obs_capacity']} observations; raise capacity."
        )
    corners = _world_corners(world)
    entry = dict(
        video_id=video_id,
        n_boxes=int(len(world["scores"])),
        fps=fps,
        pred_corners=corners,
        pred_scores=np.asarray(world["scores"]),
    )
    if "categories" in world:  # open-vocab labels (export_world class_list)
        entry["pred_classes"] = np.asarray(world["categories"])
    if gt_provider is not None:
        gt = gt_provider(seq)
        if isinstance(gt, dict):
            entry["gt_corners"] = np.asarray(gt["corners"])
            if gt.get("classes") is not None:
                entry["gt_classes"] = np.asarray(gt["classes"])
        else:
            entry["gt_corners"] = np.asarray(gt)
    if output_dir:
        save_eval_pickle(corners, output_dir, video_id, cfg["dataset"])
    return entry


def _summarize(results, wall_s: float, gt_provider) -> Dict:
    from boxfusion_tpu.eval.ap3d import (
        average_precision_3d,
        average_precision_3d_per_class,
    )

    out = dict(
        sequences=results,
        wall_s=wall_s,
        mean_fps=float(np.mean([r["fps"] for r in results])) if results else 0.0,
    )
    if gt_provider is not None and results:
        out["ap_0.25"] = average_precision_3d(results, iou_thresh=0.25)
        out["ap_0.50"] = average_precision_3d(results, iou_thresh=0.50)
        # per-class mAP when both sides carry labels: GT classes from the
        # gt_provider, predicted classes from the open-vocab labeler
        if all(
            "gt_classes" in r and "pred_classes" in r for r in results
        ):
            out["map_0.25"] = average_precision_3d_per_class(
                results, iou_thresh=0.25
            )
    return out


def evaluate_sequences(
    cfg,
    sequences: Sequence,
    detector_factory: Callable,
    gt_provider: Optional[Callable] = None,
    output_dir: Optional[str] = None,
    devices: Optional[List] = None,
    capacity: int = 512,
    fused: bool = False,
    depth_scale: float = 1000.0,
    labeler=None,
) -> Dict:
    """Run the online pipeline over many sequences, fanned out over devices.

    Args:
      sequences: iterables of Frames (each must have ``video_id``).
      detector_factory: sequence -> detector callable.  Called under
        ``jax.default_device(dev)`` for the sequence's assigned device, so
        a factory that uploads weights with ``jax.device_put`` places them
        correctly.
      gt_provider: optional sequence -> (G, 8, 3) GT world corners; enables
        AP computation.
      output_dir: if set, per-sequence fused-box pickles are written in the
        reference's format and existing outputs are skipped (resume).
      devices: jax devices to round-robin over (default: all).
      fused: use the single-dispatch FusedDevicePipeline (requires the
        factory to return a CuTRDetector; one upload + one execute per
        keyframe instead of detector + step dispatches).
      depth_scale: u16-mm depth quantization scale for the fused transfer.

    Returns:
      dict with per-sequence results and (if gt_provider) AP metrics.
    """
    from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
    from boxfusion_tpu.runtime.device_state import export_world
    from boxfusion_tpu.runtime.fused import FusedDevicePipeline

    def make_pipe(detector, dev):
        if fused:
            return FusedDevicePipeline(
                cfg, detector, labeler=labeler, capacity=capacity, device=dev,
                depth_scale=depth_scale,
            )
        return DevicePipeline(cfg, detector, labeler=labeler,
                              capacity=capacity, device=dev)

    devices = devices or jax.devices()
    pipes: Dict[int, DevicePipeline] = {}  # one long-lived pipeline per device
    stashed = []  # (video_id, final DeviceState, fps, seq-for-GT)
    t0 = time.time()

    # --- phase 1: stream every sequence, D2H-free --------------------------
    for i, seq in enumerate(sequences):
        video_id = getattr(seq, "video_id", f"seq{i}")
        out_path = (
            os.path.join(output_dir, f"{video_id}_boxes.pkl") if output_dir else None
        )
        if out_path and os.path.exists(out_path):
            print(f"[eval] {video_id}: output exists, skipping")
            continue

        di = i % len(devices)
        dev = devices[di]
        with jax.default_device(dev):  # detector calls run on this thread
            pipe = pipes.get(di)
            if pipe is None:
                # one pipeline per device, reused across its sequences: jit
                # caches key on the traced function object, so fresh
                # instances would re-trace the keyframe program per sequence
                pipe = pipes[di] = make_pipe(detector_factory(seq), dev)
            else:
                pipe.reset()
                pipe.detector = detector_factory(seq)
            pipe.run(seq, export=False)
        # retain seq only when phase 2 needs its GT (it can be a dataset
        # holding reader/prefetcher resources; don't keep hundreds alive)
        stashed.append(
            (video_id, pipe.state, pipe.fps,
             seq if gt_provider is not None else None,
             pipe.class_list)
        )

    # --- phase 2: export + pickle + score everything -----------------------
    results = []
    wall_s = time.time() - t0  # streaming time; exports excluded by design
    for video_id, state, fps, seq, class_list in stashed:
        results.append(_finalize_world(
            export_world(state, class_list=class_list), video_id, fps, seq,
            cfg, gt_provider, output_dir,
        ))
    return _summarize(results, wall_s, gt_provider)


def evaluate_sequences_batched(
    cfg,
    sequences: Sequence,
    detector,
    lanes: int,
    gt_provider: Optional[Callable] = None,
    output_dir: Optional[str] = None,
    capacity: int = 512,
    packed: bool = False,
    depth_mode: str = "u16",
    depth_scale: float = 1000.0,
    labeler=None,
) -> Dict:
    """Single-chip batched eval: groups of ``lanes`` sequences run in
    lockstep through ONE ``BatchedPipeline`` (vmapped keyframe step + one
    (N, ...) CuTR forward per round -- see runtime/batched.py), reused
    across groups so nothing re-traces (a short tail group runs on the
    same programs with spare lanes inactive).

    Same two-phase structure as ``evaluate_sequences``: phase 1 streams
    every group D2H-free and stashes the final stacked lane states; phase 2
    exports, pickles, and scores after ALL timed streaming (tunneled
    backends degrade permanently on any computed-buffer readback,
    docs/TUNNEL_PERF_NOTES.md).  Sequences are consumed lazily: only one
    group's datasets (reader/prefetcher resources) are alive at a time.

    All sequences must share one shape bucket (the pipeline raises a clear
    error otherwise); ``detector`` is a single CuTRDetector reused for every
    group.  Skip-if-exists resume applies per sequence like the fan-out.
    ``packed=True`` switches each round to the packed byte transport: ONE
    (N, L) uint8 upload + ONE dispatch instead of ~2N+3 host<->device
    interactions (runtime/batched.py::_batched_packed_fn).
    """
    from boxfusion_tpu.runtime.batched import BatchedPipeline
    from boxfusion_tpu.runtime.device_state import export_world

    if lanes < 1:
        raise ValueError(f"lanes must be >= 1, got {lanes}")

    def todo_iter():
        for i, seq in enumerate(sequences):
            video_id = getattr(seq, "video_id", f"seq{i}")
            out_path = (
                os.path.join(output_dir, f"{video_id}_boxes.pkl")
                if output_dir else None
            )
            if out_path and os.path.exists(out_path):
                print(f"[eval] {video_id}: output exists, skipping")
                continue
            yield video_id, seq

    t0 = time.time()
    pipe = None
    stashed = []  # (states pytree, [(video_id, lane_fps, gt_seq)])
    it = todo_iter()
    while True:
        group = list(itertools.islice(it, lanes))
        if not group:
            break
        if pipe is None:
            pipe = BatchedPipeline(
                cfg, detector, n_lanes=lanes, capacity=capacity,
                transport="packed" if packed else "arrays",
                depth_mode=depth_mode, depth_scale=depth_scale,
                labeler=labeler,
            )
        else:
            pipe.reset()
        pipe.run([s for _, s in group], export=False)
        stashed.append((
            pipe.states,
            [(vid, pipe.lane_fps[j],
              seq if gt_provider is not None else None)
             for j, (vid, seq) in enumerate(group)],
        ))
    wall_s = time.time() - t0  # streaming time; exports excluded by design

    results = []
    for states, entries in stashed:
        for j, (video_id, fps, seq) in enumerate(entries):
            world = export_world(
                jax.tree.map(lambda x, j=j: x[j], states),
                class_list=pipe.class_list if pipe is not None else None,
            )
            results.append(_finalize_world(
                world, video_id, fps, seq, cfg, gt_provider, output_dir,
            ))
    return _summarize(results, wall_s, gt_provider)

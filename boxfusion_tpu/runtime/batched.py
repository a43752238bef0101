"""Batched multi-sequence pipeline: N sequences in lockstep on ONE chip.

The device fan-out (eval/runner.py) parallelizes sequences across chips;
this module parallelizes them across the BATCH dimension of a single chip
-- the TPU-native answer to offline eval throughput (SURVEY.md section 2
checklist (c)): the CuTR forward runs once per keyframe ROUND on an
(N, ...) batch (bigger matmuls, better MXU utilization than N serial
B=1 forwards), and the keyframe association/fusion step runs as ONE
``jax.vmap``-ed program over N stacked ``DeviceState`` lanes.

Decision parity: vmap preserves the per-lane semantics of the keyframe
step exactly (each lane sees its own state/detections/metadata), so a
lane's exported world matches a single-sequence ``DevicePipeline`` run of
the same frames -- asserted by tests/test_batched.py.

Lanes may have different lengths: exhausted lanes go inactive and their
state passes through unchanged (``lax.cond`` per lane) while live lanes
keep stepping.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.data.preprocess import Preprocessor
from boxfusion_tpu.fusion import load_pst
from boxfusion_tpu.runtime.detector import CuTRDetector
from boxfusion_tpu.runtime.device_pipeline import pack_meta, step_config_from
from boxfusion_tpu.runtime.device_state import export_world, init_state
from boxfusion_tpu.runtime.device_step import (
    META_WIDTH,
    _keyframe_step_impl,
    pad_detections,
)

_KEEP = ("scores", "pred_boxes", "boxes3d", "R", "proj_xy")

# program cache keyed on (cfg, kmax): vmapped trace is expensive and every
# BatchedPipeline instance with the same config shares one executable
_STEP_CACHE: Dict[tuple, object] = {}

# packed-transport programs additionally key on the model + shape bucket
_PACKED_CACHE: Dict[tuple, object] = {}

# forward cache keyed on the model (a hashable flax config dataclass):
# jit keys on the function OBJECT, so a per-instance jax.jit(model.apply)
# would re-trace the full CuTR forward for every pipeline instance
_FWD_CACHE: Dict[object, object] = {}


def _lane_step(cfg):
    """One lane's keyframe transition, inactive lanes passing through."""

    def lane_step(state, det, meta, active, pst):
        pose = meta[:16].reshape(4, 4)
        K_img = meta[16:25].reshape(3, 3)
        K_depth = meta[25:34].reshape(3, 3)
        image_hw = meta[34:36]
        frame_idx = meta[36].astype(jnp.int32)

        def go(s):
            return _keyframe_step_impl(
                s, det, pst, pose, K_img, K_depth, image_hw, frame_idx, cfg
            )

        return jax.lax.cond(active, go, lambda s: s, state)

    return lane_step


def _batched_step_fn(cfg, kmax: int):
    key = (cfg, kmax)
    fn = _STEP_CACHE.get(key)
    if fn is not None:
        return fn

    lane_step = _lane_step(cfg)

    def step(states, det, metas, active, pst):
        det = pad_detections(det, kmax)  # shared contract with devdet path
        return jax.vmap(lane_step, in_axes=(0, 0, 0, 0, None))(
            states, det, metas, active, pst
        )

    fn = jax.jit(step)
    _STEP_CACHE[key] = fn
    return fn


def _batched_packed_fn(model, cfg, kmax: int, *, h: int, w: int, dh: int,
                       dw: int, square: int, ratio: int, depth_mode: str,
                       labeler=None, label_budget: int = 32,
                       scale_box: float = 1.5, clip_coeff: float = 0.0,
                       raw_score_thresh: float = 0.0):
    """ONE program for a whole keyframe round: unpack N packed byte
    buffers, package (normalize/pad/whiten), run the (N, ...) CuTR forward,
    optionally CLIP-label every lane, and vmap the keyframe step -- fed by
    a single (N, L) uint8 upload.

    The arrays transport pays ~2N+3 host->device interactions per round
    (per-lane image+depth uploads and package dispatches, the stack, the
    forward, the step); on remote-attached chips each interaction costs
    milliseconds of RPC (docs/TUNNEL_PERF_NOTES.md), so the packed
    transport's 1 upload + 1 execute dominates for eval throughput.  The
    byte layout is ``runtime.fused.pack_fused_buffer`` exactly; the
    labeling semantics (raw-score filter before CLIP, boost, background
    drop, per-lane budget-overflow counters into stats[4]) are the fused
    B=1 engine's (fused.py) with a lane axis.
    """
    import dataclasses

    from boxfusion_tpu.data.preprocess import _package_jit
    from boxfusion_tpu.runtime.fused import label_boost_core, unpack_fused_buffer

    key = (
        model, cfg, kmax, h, w, dh, dw, square, ratio, depth_mode,
        None if labeler is None else (labeler.cfg, labeler.text_features.shape,
                                      labeler.sim_thres),
        label_budget, scale_box, clip_coeff, raw_score_thresh,
    )
    fn = _PACKED_CACHE.get(key)
    if fn is not None:
        return fn

    lane_step = _lane_step(cfg)

    def one(buf):
        image_u8, depth, meta = unpack_fused_buffer(
            buf, h=h, w=w, dh=dh, dw=dw, depth_mode=depth_mode
        )
        K_img = meta[16:25].reshape(3, 3)
        T_gravity = meta[37:46].reshape(3, 3)
        batch = _package_jit(image_u8, depth, K_img, T_gravity, square, ratio)
        return batch, meta

    def lane(state, det, meta, act, ovf, pst):
        # per-lane label-budget overflow -> stats[4]; no-op when inactive
        state = dataclasses.replace(
            state, stats=state.stats.at[4].add(jnp.where(act, ovf, 0))
        )
        return lane_step(state, det, meta, act, pst)

    def step(params, clip_params, text_features, states, bufs, active, pst):
        batches, metas = jax.vmap(one)(bufs)
        # _package_jit leaves carry a leading singleton batch dim; fold the
        # vmapped lane axis into it -> (N, ...) like the arrays transport
        stacked = jax.tree.map(
            lambda x: x.reshape((x.shape[0],) + x.shape[2:]), batches
        )
        out = model.apply(params, stacked)
        det = {k: v for k, v in out.items() if k in _KEEP}
        n_lanes = det["scores"].shape[0]
        if labeler is not None:
            # the fused B=1 label stage, vmapped over the lane axis --
            # decision parity with FusedDevicePipeline by construction
            def boost(det_1, img, hw):
                return label_boost_core(
                    labeler, det_1, img, hw,
                    label_budget=label_budget, scale_box=scale_box,
                    clip_coeff=clip_coeff, raw_score_thresh=raw_score_thresh,
                    clip_params=clip_params, text_features=text_features,
                )

            det, overflow = jax.vmap(boost)(det, stacked.image, metas[:, 34:36])
        else:
            overflow = jnp.zeros((n_lanes,), jnp.int32)
        det = pad_detections(det, kmax)
        return jax.vmap(lane, in_axes=(0, 0, 0, 0, 0, None))(
            states, det, metas, active, overflow, pst
        )

    fn = jax.jit(step)
    _PACKED_CACHE[key] = fn
    return fn


class BatchedPipeline:
    """Run N posed RGB-D sequences in lockstep on one device.

    Args:
      cfg: a Config (utils/config.py).
      detector: a ``CuTRDetector`` -- its model/params are applied to the
        stacked (N, ...) FrameBatch directly (the per-frame call path is
        bypassed, like ``FusedDevicePipeline``).
      n_lanes: number of concurrent sequences.
      capacity: world slots per lane.
    """

    def __init__(self, cfg, detector: CuTRDetector, n_lanes: int,
                 capacity: int = 512, transport: str = "arrays",
                 depth_mode: str = "u16", depth_scale: float = 1000.0,
                 labeler=None):
        import dataclasses

        from boxfusion_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        if transport not in ("arrays", "packed"):
            raise ValueError(f"transport must be arrays|packed, got {transport}")
        if depth_mode not in ("u16", "f32"):
            raise ValueError(f"depth_mode must be u16|f32, got {depth_mode}")
        if labeler is not None and transport != "packed":
            raise ValueError(
                "open-vocab labeling is traced into the packed program; use "
                "transport='packed' with a labeler"
            )
        self.cfg = cfg
        self.detector = detector
        self.labeler = labeler
        self.n_lanes = int(n_lanes)
        self.capacity = int(capacity)
        self.transport = transport
        self.depth_mode = depth_mode
        self.depth_scale = float(depth_scale)
        self.step_cfg = step_config_from(cfg)
        self.class_list = None
        if labeler is not None:
            # raw-score filter runs before CLIP inside the program; the
            # step must not re-test the boosted scores (device_pipeline.py)
            self.step_cfg = dataclasses.replace(self.step_cfg, score_thresh=-1e8)
            self.class_list = list(labeler.class_list) + [""]
            self._tf_dev = jnp.asarray(
                np.asarray(labeler.text_features, np.float32)
            )
        self.kmax = int(cfg["detection"]["max_detections"])
        self.reset()
        bf = cfg["box_fusion"]
        self.pst = jnp.asarray(
            load_pst(bf["pst_path"] if "pst_path" in bf else None, int(bf["pst_size"]))
        )
        self._pre = Preprocessor(detector.buckets)
        fwd = _FWD_CACHE.get(detector.model)
        if fwd is None:
            fwd = _FWD_CACHE[detector.model] = jax.jit(detector.model.apply)
        self._fwd = fwd

    def reset(self) -> None:
        """Fresh per-lane world state; compiled programs stay cached -- use
        this (or one instance per group) when driving many sequence groups
        so the vmapped step and the CuTR forward trace exactly once."""
        lanes = [
            init_state(
                capacity=self.capacity,
                max_views=int(self.cfg["association"]["max_views"]),
                obs_capacity=int(self.cfg["association"]["max_observations"]),
            )
            for _ in range(self.n_lanes)
        ]
        self.states = jax.tree.map(lambda *xs: jnp.stack(xs), *lanes)

    def _pack_meta(self, frame, count: int) -> np.ndarray:
        return pack_meta(frame, count)

    def _process_keyframes_packed(self, frames, counts, live) -> None:
        """Packed-transport round: ONE (N, L) uint8 upload + ONE dispatch
        (unpack + package + CuTR forward + vmapped step all in-program)."""
        from boxfusion_tpu.data.preprocess import resolve_pad_and_ratio
        from boxfusion_tpu.runtime.fused import pack_fused_buffer

        keys = set()
        bufs: List[Optional[np.ndarray]] = [None] * self.n_lanes
        for i in live:
            f = frames[i]
            if f.depth is None:
                raise ValueError(
                    "packed transport requires depth frames (the buffer "
                    "layout carries a depth plane); use transport='arrays'"
                )
            square, ratio = resolve_pad_and_ratio(
                f.image, f.depth, self.detector.buckets
            )
            keys.add((square, ratio, f.image.shape[:2], f.depth.shape[:2]))
            bufs[i] = pack_fused_buffer(
                f, counts[i], self.depth_mode, self.depth_scale
            )
        if len(keys) != 1:
            raise ValueError(
                f"batched lanes must share one shape bucket, got {sorted(keys)} "
                "-- group sequences of equal resolution per BatchedPipeline"
            )
        square, ratio, (h, w), (dh, dw) = keys.pop()
        first = bufs[live[0]]
        stacked = np.stack([b if b is not None else first for b in bufs])
        active = jnp.asarray([f is not None for f in frames])
        if self.labeler is not None:
            det_cfg = self.cfg["detection"]
            label_kw = dict(
                labeler=self.labeler,
                label_budget=int(det_cfg["max_label_boxes"]),
                scale_box=float(det_cfg["scale_box"]),
                clip_coeff=float(self.cfg["box_fusion"]["clip_sim_coeff"]),
                raw_score_thresh=float(det_cfg["score_thresh"]),
            )
            clip_params, tf = self.labeler.params, self._tf_dev
        else:
            label_kw = {}
            clip_params = tf = None
        fn = _batched_packed_fn(
            self.detector.model, self.step_cfg, self.kmax,
            h=h, w=w, dh=dh, dw=dw, square=square, ratio=ratio,
            depth_mode=self.depth_mode, **label_kw,
        )
        self.states = fn(
            self.detector.params, clip_params, tf, self.states,
            jnp.asarray(stacked), active, self.pst,
        )

    def process_keyframes(self, frames: Sequence[Optional[object]],
                          counts: Sequence[int]) -> None:
        """One lockstep keyframe round.

        Args:
          frames: per-lane Frame or None (lane exhausted / not at keyframe).
          counts: per-lane frame counters (the reference's ``count``).
        """
        live = [i for i, f in enumerate(frames) if f is not None]
        if not live:
            return
        if self.transport == "packed":
            return self._process_keyframes_packed(frames, counts, live)
        batches, keys = [], set()
        metas = np.zeros((self.n_lanes, META_WIDTH), np.float32)
        for i in live:
            b, square, ratio = self._pre(
                frames[i].image, frames[i].depth, frames[i].K,
                frames[i].T_gravity,
            )
            keys.add((square, ratio, frames[i].image.shape[:2],
                      frames[i].depth.shape[:2]))
            batches.append(b)
            metas[i] = self._pack_meta(frames[i], counts[i])
        if len(keys) != 1:
            raise ValueError(
                f"batched lanes must share one shape bucket, got {sorted(keys)} "
                "-- group sequences of equal resolution per BatchedPipeline"
            )
        # dead lanes replicate the first live batch (masked inactive below)
        stacked = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *(
            [batches[live.index(i)] if i in live else batches[0]
             for i in range(self.n_lanes)]
        ))
        out = self._fwd(self.detector.params, stacked)
        det = {k: v for k, v in out.items() if k in _KEEP}
        active = jnp.asarray([f is not None for f in frames])
        self.states = _batched_step_fn(self.step_cfg, self.kmax)(
            self.states, det, jnp.asarray(metas), active, self.pst
        )

    def run(self, sequences: Sequence, gap: Optional[int] = None,
            export: bool = True) -> Optional[List[dict]]:
        """Stream up to N sequences in lockstep.

        Fewer than ``n_lanes`` sequences is fine (a tail group): the spare
        lanes stay inactive, so the compiled (n_lanes, ...) programs are
        reused instead of recompiling for the smaller batch.

        With ``export=True`` returns one world dict per given sequence.
        With ``export=False`` returns None and leaves the final lane states
        on device (read later via ``export_worlds``): exporting reads back
        COMPUTED buffers, which permanently degrades tunneled backends
        (docs/TUNNEL_PERF_NOTES.md), so multi-group drivers should defer
        every export until after the last timed group.
        """
        import time

        from boxfusion_tpu.runtime.stream import iter_with_last

        gap = int(self.cfg["data"]["gap"]) if gap is None else gap
        if len(sequences) > self.n_lanes:
            raise ValueError(f"{len(sequences)} sequences > {self.n_lanes} lanes")
        self.n_run = len(sequences)
        iters: List[Optional[object]] = [iter_with_last(s) for s in sequences]
        iters += [None] * (self.n_lanes - len(iters))  # spare lanes inactive
        counts = [0] * self.n_lanes
        start = time.time()
        total = 0
        while True:
            round_frames: List[Optional[object]] = [None] * self.n_lanes
            alive = False
            for i, it in enumerate(iters):
                if it is None:
                    continue
                advanced = False
                # advance lane i to its next keyframe (gap frames; the final
                # frame is always a keyframe, reference demo.py:200)
                while True:
                    try:
                        f, is_last = next(it)
                    except StopIteration:
                        iters[i] = None
                        break
                    advanced = True
                    if counts[i] % gap == 0 or is_last:
                        round_frames[i] = f
                        counts[i] += 1
                        if is_last:
                            iters[i] = None
                        break
                    counts[i] += 1
                alive = alive or advanced
            if not alive:
                break
            self.process_keyframes(round_frames, [c - 1 for c in counts])
            total += sum(f is not None for f in round_frames)
        jax.block_until_ready(self.states.n)
        dur = time.time() - start
        self.keyframes_per_s = total / max(dur, 1e-9)
        # per-lane frames/s over the shared group wall-clock: comparable to
        # the per-sequence fps the device fan-out records (runner.py)
        self.lane_fps = [c / max(dur, 1e-9) for c in counts[: self.n_run]]
        print(f"Batched: {total} keyframes over {self.n_run} lanes in "
              f"{dur:.2f} s ({self.keyframes_per_s:.2f} kf/s)")
        return self.export_worlds() if export else None

    def export_worlds(self, n: Optional[int] = None) -> List[dict]:
        """Read back the first ``n`` lanes' world sets (default: the lanes
        the last ``run`` call actually streamed).  D2H of computed buffers
        -- call only after all timed streaming is done."""
        n = getattr(self, "n_run", self.n_lanes) if n is None else n
        return [
            export_world(
                jax.tree.map(lambda x, i=i: x[i], self.states),
                class_list=self.class_list,
            )
            for i in range(n)
        ]

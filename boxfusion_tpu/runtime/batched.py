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

# forward cache keyed on the model (a hashable flax config dataclass):
# jit keys on the function OBJECT, so a per-instance jax.jit(model.apply)
# would re-trace the full CuTR forward for every pipeline instance
_FWD_CACHE: Dict[object, object] = {}


def _batched_step_fn(cfg, kmax: int):
    key = (cfg, kmax)
    fn = _STEP_CACHE.get(key)
    if fn is not None:
        return fn

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

    def step(states, det, metas, active, pst):
        det = pad_detections(det, kmax)  # shared contract with devdet path
        return jax.vmap(lane_step, in_axes=(0, 0, 0, 0, None))(
            states, det, metas, active, pst
        )

    fn = jax.jit(step)
    _STEP_CACHE[key] = fn
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
                 capacity: int = 512):
        from boxfusion_tpu.utils.cache import enable_compilation_cache

        enable_compilation_cache()
        self.cfg = cfg
        self.detector = detector
        self.n_lanes = int(n_lanes)
        self.capacity = int(capacity)
        self.step_cfg = step_config_from(cfg)
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

        gap = int(self.cfg["data"]["gap"]) if gap is None else gap
        if len(sequences) > self.n_lanes:
            raise ValueError(f"{len(sequences)} sequences > {self.n_lanes} lanes")
        self.n_run = len(sequences)
        iters: List[Optional[object]] = [iter(s) for s in sequences]
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
                # advance lane i to its next keyframe (gap frames)
                while True:
                    try:
                        f = next(it)
                    except StopIteration:
                        iters[i] = None
                        break
                    advanced = True
                    if counts[i] % gap == 0:
                        round_frames[i] = f
                        counts[i] += 1
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
            export_world(jax.tree.map(lambda x, i=i: x[i], self.states))
            for i in range(n)
        ]

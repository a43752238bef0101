"""Single-dispatch keyframe path: detect + label + associate + fuse, one jit.

The reference executes a keyframe as ~5 separate GPU interactions (model
forward demo.py:136, CLIP crops demo.py:167, per-iteration fusion kernel
launches box_fusion.py:664-666) with host round-trips between them.  The
device-resident engine (device_pipeline.py) already collapsed the
association/fusion side into one dispatch; this module collapses the ENTIRE
keyframe -- pixel packaging, CuTR forward, open-vocab CLIP labeling, and
the keyframe association/fusion step -- into ONE jitted program per
(image-shape, pad-bucket) key, fed by ONE packed byte-buffer upload.

Why: on remote-attached TPUs every host<->device interaction costs
milliseconds of RPC latency (docs/TUNNEL_PERF_NOTES.md measures
~2.7 ms/transfer + ~12 ms/MB in the degraded tunnel mode).  Per keyframe
the fused path pays exactly one upload (pixels u8 + depth u16 + metadata,
~1 MB) and one execute, and never syncs: the returned state feeds the next
keyframe's call, so successive keyframes pipeline on device.

Transfer format (one flat uint8 buffer):

  [ image u8 (H*W*3) | depth u16-LE (Hd*Wd*2) | meta f32-LE (48*4) ]

Depth rides as uint16 millimetres (lossless for CA-1M/ScanNet sources,
whose on-disk depth IS u16 at ``depth_scale``; mode "f32" is bit-exact for
synthetic float depth) -- halving the dominant upload vs float32.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.data.preprocess import (
    PIXEL_MEAN_U8,
    PIXEL_STD_U8,
    _package_jit,
    resolve_pad_and_ratio,
)
from boxfusion_tpu.runtime.detector import _TAKE, CuTRDetector
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
from boxfusion_tpu.runtime.device_step import _keyframe_step_impl, pad_detections

# pose 16 | K_img 9 | K_depth 9 | image_hw 2 | frame_idx 1  (= device_step
# META layout, device_step.py:736) | T_gravity 9 | depth_scale 1 | pad 1
FUSED_META_WIDTH = 48


def pack_fused_buffer(frame, count: int, depth_mode: str,
                      depth_scale: float, scratch=None) -> np.ndarray:
    """Pack one frame into the flat uint8 transfer buffer (module docstring
    layout).  Shared by the B=1 fused engine and the batched packed
    transport so the byte layout has exactly one definition.

    ``scratch``: optional (dh, dw) float32 workspace for the u16 depth
    conversion.  Packing is the dominant per-keyframe HOST cost at gap=1
    (~0.45 ms of the chunked path's ~1.1 ms); out-of-place temporaries in
    the conversion are ~30% of it, so steady-state callers
    (FusedDevicePipeline) pass a reused buffer.  NOT thread-safe to share
    one scratch across concurrent packers."""
    h, w = frame.image.shape[:2]
    dh, dw = frame.depth.shape[:2]
    n_img = h * w * 3
    n_dep = dh * dw * (2 if depth_mode == "u16" else 4)
    buf = np.empty(n_img + n_dep + FUSED_META_WIDTH * 4, np.uint8)
    buf[:n_img] = np.ascontiguousarray(frame.image, np.uint8).reshape(-1)
    if depth_mode == "u16":
        # f32 throughout: scale+round-half-up+clip (a float64 detour here
        # measurably costs host time per keyframe; f32 holds every integer
        # to 2^24 so the 0..65535 result is exact).  In-place into scratch,
        # casting directly into the buffer's u16 view, saves two
        # temporaries vs the naive expression (measured 0.50 -> 0.36 ms).
        if scratch is None or scratch.shape != (dh, dw):
            scratch = np.empty((dh, dw), np.float32)
        # copy-assign FIRST so the ufunc loop below runs in f32 regardless
        # of the source dtype (np.multiply with out= picks the loop from the
        # INPUT dtypes -- a float64 depth would silently compute in f64);
        # the reshape also accepts a trailing singleton channel (dh, dw, 1)
        scratch[...] = np.asarray(frame.depth).reshape(dh, dw)
        np.multiply(scratch, np.float32(depth_scale), out=scratch)
        np.add(scratch, np.float32(0.5), out=scratch)
        np.clip(scratch, 0, 65535, out=scratch)
        out = buf[n_img : n_img + n_dep].view("<u2").reshape(dh, dw)
        out[...] = scratch  # trunc(x + 0.5) == round-half-up for x >= 0
    else:
        d = np.asarray(frame.depth, "<f4")
        buf[n_img : n_img + n_dep] = d.reshape(-1).view(np.uint8)
    meta = np.zeros(FUSED_META_WIDTH, "<f4")
    meta[:16] = np.asarray(frame.gt_pose, np.float32).ravel()
    meta[16:25] = np.asarray(frame.K, np.float32).ravel()
    meta[25:34] = np.asarray(frame.K_depth, np.float32).ravel()
    meta[34:36] = (float(h), float(w))
    meta[36] = float(count)
    meta[37:46] = np.asarray(frame.T_gravity, np.float32).ravel()
    meta[46] = depth_scale
    buf[n_img + n_dep :] = meta.view(np.uint8)
    return buf


def unpack_fused_buffer(buf, *, h: int, w: int, dh: int, dw: int,
                        depth_mode: str):
    """Device-side inverse of ``pack_fused_buffer`` (traced; one frame).

    Returns (image_u8 (h, w, 3), metric depth (dh, dw), meta (48,) f32).
    """
    n_img = h * w * 3
    n_dep = dh * dw * (2 if depth_mode == "u16" else 4)
    image_u8 = buf[:n_img].reshape(h, w, 3)
    d_raw = buf[n_img : n_img + n_dep]
    meta = jax.lax.bitcast_convert_type(
        buf[n_img + n_dep :].reshape(FUSED_META_WIDTH, 4), jnp.float32
    )
    if depth_mode == "u16":
        depth = jax.lax.bitcast_convert_type(
            d_raw.reshape(dh, dw, 2), jnp.uint16
        ).astype(jnp.float32)
        depth = depth / meta[46]  # depth_scale (units per metre)
    else:
        depth = jax.lax.bitcast_convert_type(
            d_raw.reshape(dh, dw, 4), jnp.float32
        )
    return image_u8, depth, meta

# Module-level program cache.  jit caches key on the traced function OBJECT,
# so per-pipeline closures would re-trace (tens of seconds for CuTR+CLIP)
# for every new pipeline -- e.g. one per sequence in the eval fan-out.  The
# cache key is purely semantic (model/labeler configs + static scalars);
# weights and text features ride as call ARGUMENTS, never as closure
# constants, so one cached program serves any parameter values.
_PROGRAM_CACHE: Dict[tuple, object] = {}


def label_buckets_for(budget: int) -> tuple:
    """Ascending crop-count buckets ending at ``budget``.

    0 skips CLIP entirely on empty keyframes; intermediate multiples of 32
    keep the compile count small while bounding wasted crops at <32.  The
    extra 112 step splits the top band: the tower's cost is linear in
    crops and the live-count distribution concentrates just above 96
    (median ~100 at the calibrated bench load), so without it the hottest
    keyframes all pay the full 128-crop tower; with it they pay 112
    (~23 ms less per keyframe on the v5e) for one more cached compile."""
    return (0,) + tuple(b for b in (32, 64, 96, 112) if b < budget) + (budget,)


def label_boost_core(
    labeler, det, norm_image, image_hw, *, label_budget, scale_box,
    clip_coeff, raw_score_thresh, clip_params, text_features,
    bucketed: bool = False,
):
    """Open-vocab labeling of ONE frame's detections, traced inline.

    The single shared implementation of the reference's per-keyframe label
    stage (demo.py:138-171): raw-score filter BEFORE CLIP, top-``budget``
    boost, background drop (scores sunk to -1e9 so the step's score filter
    removes them).  ``norm_image`` is the preprocessor-normalized image;
    de-normalization to 0..255 happens here.  Used unbatched by the fused
    B=1 engine and vmapped over the lane axis by ``runtime.batched`` --
    decision parity between the two engines is BY CONSTRUCTION.

    ``bucketed=True`` (B=1 engine only): instead of always cropping the
    full ``label_budget`` pad, count the live (raw-score-passing) rows ON
    DEVICE and ``lax.switch`` into the smallest bucket that covers them
    (``label_buckets_for``) -- a 45-detection keyframe then pays 64 crops'
    CLIP FLOPs, not 128.  Decision-identical: detections are score-sorted,
    so live rows are a prefix; rows past the live count are score-masked
    to -1e9 and dropped by the step's score filter whether or not they
    were cropped.  TPU ``lax.switch`` executes only the selected branch.
    MUST stay False under vmap (runtime.batched): a vmapped switch lowers
    to running EVERY branch and selecting, i.e. 4x the CLIP cost.

    Returns ``(det', overflow)`` where overflow counts live rows past the
    label budget (folded into stats[4] by the callers)."""
    image_dev = norm_image * jnp.asarray(PIXEL_STD_U8) + jnp.asarray(PIXEL_MEAN_U8)
    raw_ok = det["scores"] >= raw_score_thresh
    masked = jnp.where(raw_ok, det["scores"], -1e9)
    budget = min(int(label_budget), int(det["pred_boxes"].shape[0]))

    def boost_at(b: int):
        if b == 0:
            # no live rows: raw scores stand, every row is background --
            # exactly _boost_impl with budget=0, minus the 0-crop tower
            n = det["scores"].shape[0]
            n_classes = (
                labeler.text_features.shape[0]
                if text_features is None else text_features.shape[0]
            )
            return (
                masked,
                jnp.full(n, n_classes, jnp.int32),
                jnp.sum(masked > -1e8).astype(jnp.int32),
            )
        new_scores, categories, _, overflow = labeler._boost_impl(
            image_dev,
            det["pred_boxes"],
            masked,
            image_hw,
            jnp.float32(scale_box),
            jnp.float32(clip_coeff),
            b,
            params=clip_params,
            text_features=text_features,
        )
        return new_scores, categories, overflow

    if not bucketed:
        new_scores, categories, overflow = boost_at(budget)
    else:
        buckets = label_buckets_for(budget)
        live = jnp.sum(raw_ok).astype(jnp.int32)
        # smallest bucket >= live (saturating at the full budget)
        idx = jnp.sum(live > jnp.asarray(buckets[:-1], jnp.int32))
        new_scores, categories, overflow = jax.lax.switch(
            idx, [functools.partial(boost_at, b) for b in buckets]
        )
    det = dict(det, scores=jnp.where(raw_ok, new_scores, -1e9), category=categories)
    return det, overflow


def make_fused_keyframe_fn(
    model,
    step_cfg,
    *,
    h: int,
    w: int,
    dh: int,
    dw: int,
    square: int,
    ratio: int,
    kmax: int,
    depth_mode: str = "u16",
    labeler=None,
    label_budget: int = 32,
    scale_box: float = 1.5,
    clip_coeff: float = 0.0,
    raw_score_thresh: float = 0.0,
    label_bucketing: bool = True,
):
    """Build the jitted fused keyframe program for one shape bucket.

    Returns ``fn(params, clip_params, text_features, state, buf, pst) ->
    state`` where ``buf`` is the packed uint8 transfer buffer.  The CLIP
    label-budget overflow count folds into ``state.stats[4]`` INSIDE the
    program: reading any computed value back mid-sequence (even a 4-byte
    scalar) flips the tunneled backend into its degraded mode
    (docs/TUNNEL_PERF_NOTES.md "D2H of computed buffers"), so nothing may
    force a D2H until end-of-sequence export.  ``clip_params``/
    ``text_features`` are ignored (pass None) when ``labeler`` is None.

    Programs are cached module-wide on a semantic key, so any number of
    pipeline instances (one per sequence in eval fan-outs) share one trace.
    """
    key = (
        model,
        None if labeler is None else (labeler.cfg, labeler.text_features.shape,
                                      labeler.sim_thres),
        step_cfg, h, w, dh, dw, square, ratio, kmax, depth_mode,
        label_budget, scale_box, clip_coeff, raw_score_thresh, label_bucketing,
    )
    cached = _PROGRAM_CACHE.get(key)
    if cached is not None:
        return cached

    fused = _fused_body(
        model, step_cfg, h=h, w=w, dh=dh, dw=dw, square=square, ratio=ratio,
        kmax=kmax, depth_mode=depth_mode, labeler=labeler,
        label_budget=label_budget, scale_box=scale_box, clip_coeff=clip_coeff,
        raw_score_thresh=raw_score_thresh, label_bucketing=label_bucketing,
    )
    fn = jax.jit(fused)
    _PROGRAM_CACHE[key] = fn
    return fn


def _fused_body(
    model, step_cfg, *, h, w, dh, dw, square, ratio, kmax, depth_mode,
    labeler, label_budget, scale_box, clip_coeff, raw_score_thresh,
    label_bucketing=True,
):
    """The pure one-keyframe program body shared by the per-frame jit and
    the chunked ``lax.scan`` wrapper."""

    def fused(params, clip_params, text_features, state, buf, pst):
        image_u8, depth, meta = unpack_fused_buffer(
            buf, h=h, w=w, dh=dh, dw=dw, depth_mode=depth_mode
        )
        pose = meta[:16].reshape(4, 4)
        K_img = meta[16:25].reshape(3, 3)
        K_depth = meta[25:34].reshape(3, 3)
        image_hw = meta[34:36]
        frame_idx = meta[36].astype(jnp.int32)
        T_gravity = meta[37:46].reshape(3, 3)

        batch = _package_jit(image_u8, depth, K_img, T_gravity, square, ratio)
        out = model.apply(params, batch)
        det = {k: v[0] for k, v in out.items() if k in _TAKE}
        det = {
            k: v
            for k, v in det.items()
            if k in ("scores", "pred_boxes", "boxes3d", "R", "proj_xy")
        }

        if labeler is not None:
            # the step's own score filter is bypassed (DevicePipeline.__init__)
            det, overflow = label_boost_core(
                labeler, det, batch.image[0], image_hw,
                label_budget=label_budget, scale_box=scale_box,
                clip_coeff=clip_coeff, raw_score_thresh=raw_score_thresh,
                clip_params=clip_params, text_features=text_features,
                bucketed=label_bucketing,
            )
            state = dataclasses.replace(
                state, stats=state.stats.at[4].add(overflow)
            )

        # pad/truncate to the step's static detection budget
        det = pad_detections(det, kmax)
        state = _keyframe_step_impl(
            state, det, pst, pose, K_img, K_depth, image_hw, frame_idx, step_cfg
        )
        return state

    return fused


def make_fused_chunk_fn(
    model,
    step_cfg,
    *,
    chunk: int,
    h: int,
    w: int,
    dh: int,
    dw: int,
    square: int,
    ratio: int,
    kmax: int,
    depth_mode: str = "u16",
    labeler=None,
    label_budget: int = 32,
    scale_box: float = 1.5,
    clip_coeff: float = 0.0,
    raw_score_thresh: float = 0.0,
    label_bucketing: bool = True,
):
    """The throughput variant: ``fn(params, clip_params, text_features,
    state, bufs (chunk, L) u8, pst) -> state`` runs ``chunk`` consecutive
    keyframes as ONE ``lax.scan`` dispatch.

    Why: per-call dispatch cost on the tunneled chip is dominated by
    host-side argument processing of the ~700-leaf CuTR+CLIP parameter
    pytrees (~0.64 ms/call measured, vs 0.017 ms for a 1-leaf program --
    tools/profile_gap1.py), which at gap=1 caps the live-SLAM profile near
    500 keyframes/s while the device itself keeps up at <0.7 ms/keyframe.
    Scanning ``chunk`` frames per call amortizes that cost (and the
    per-upload RPC) by ``chunk``.  State chains INSIDE the scan in frame
    order, so decisions are identical to ``chunk`` sequential dispatches;
    the cost is ``chunk`` frames of result latency, which is why this is
    opt-in (``FusedDevicePipeline(chunk=...)``).
    """
    key = (
        "chunk", chunk, model,
        None if labeler is None else (labeler.cfg, labeler.text_features.shape,
                                      labeler.sim_thres),
        step_cfg, h, w, dh, dw, square, ratio, kmax, depth_mode,
        label_budget, scale_box, clip_coeff, raw_score_thresh, label_bucketing,
    )
    cached = _PROGRAM_CACHE.get(key)
    if cached is not None:
        return cached

    body = _fused_body(
        model, step_cfg, h=h, w=w, dh=dh, dw=dw, square=square, ratio=ratio,
        kmax=kmax, depth_mode=depth_mode, labeler=labeler,
        label_budget=label_budget, scale_box=scale_box, clip_coeff=clip_coeff,
        raw_score_thresh=raw_score_thresh, label_bucketing=label_bucketing,
    )

    def fused_chunk(params, clip_params, text_features, state, bufs, pst):
        def step(st, buf):
            return body(params, clip_params, text_features, st, buf, pst), None

        state, _ = jax.lax.scan(step, state, bufs)
        return state

    fn = jax.jit(fused_chunk)
    _PROGRAM_CACHE[key] = fn
    return fn


class FusedDevicePipeline(DevicePipeline):
    """DevicePipeline whose keyframe is ONE upload + ONE dispatch.

    Takes a ``CuTRDetector`` (for its model/params); the detector's own
    per-call path is bypassed -- its model is traced into the fused
    program.  Open-vocab labeling joins the same program when a labeler
    with device-resident weights is supplied.
    """

    def __init__(
        self,
        cfg,
        detector: CuTRDetector,
        labeler=None,
        capacity: int = 512,
        depth_mode: str = "u16",
        depth_scale: float = 1000.0,
        device=None,
        chunk: int = 1,
        chunk_auto: bool = True,
    ):
        super().__init__(cfg, detector, labeler, capacity, device=device)
        if depth_mode not in ("u16", "f32"):
            raise ValueError(f"depth_mode must be u16|f32, got {depth_mode}")
        if chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        self.depth_mode = depth_mode
        self.depth_scale = float(depth_scale)
        # chunk > 1: group consecutive same-shape keyframes into one scanned
        # dispatch (make_fused_chunk_fn) -- identical decisions, ~chunk x
        # lower per-keyframe dispatch cost, ``chunk`` keyframes of result
        # latency.  The live default stays 1 (lowest latency).
        #
        # chunk_auto: r4's A/B showed chunking LOSING at gap 20 (57.4 vs
        # 63.6 FPS) so ``run()`` used to disable it when ``gap > chunk``.
        # The r5 re-measurement INVERTS that: after the association-gate cut
        # and the whole-sequence CLIP attention kernel shrank the
        # per-keyframe device program, the per-dispatch host+tunnel cost
        # (~40 ms: pack, dispatch, completion barrier) dominates at every
        # gap, and chunk=8 wins BOTH profiles (BENCH_r05: gap=1 6.27 vs
        # 4.94 keyframes/s, gap=20 108.2 vs 93.1 FPS).  chunk_auto is now
        # a no-op kept for API stability; chunking applies at any gap.
        # The live default stays chunk=1 only because chunked dispatch adds
        # ``chunk`` keyframes of result latency.
        self.chunk = int(chunk)
        self.chunk_auto = bool(chunk_auto)
        self._chunk_effective = self.chunk
        self._pending: list = []  # [(shape-key, packed buf)] awaiting a chunk
        self._pack_scratch: Optional[np.ndarray] = None  # caller-thread only
        self._fused_fns: Dict[tuple, object] = {}
        self._text_features_dev = None
        self._params_dev = None
        self._clip_params_dev = None
        self.class_list = (
            list(labeler.class_list) + [""] if labeler is not None else None
        )

    def _get_fused(self, key, chunk: int = 1):
        # model in the key: pipe.detector may be swapped (eval fan-out), and
        # a shape-only key would keep serving a program traced from the OLD
        # detector's model.  The module-level cache still dedupes programs.
        h, w, dh, dw, square, ratio = key
        key = (self.detector.model, chunk, *key)
        fn = self._fused_fns.get(key)
        if fn is None:
            det_cfg = self.cfg["detection"]
            maker = (
                make_fused_keyframe_fn if chunk == 1
                else functools.partial(make_fused_chunk_fn, chunk=chunk)
            )
            fn = maker(
                self.detector.model,
                self.step_cfg,
                h=h,
                w=w,
                dh=dh,
                dw=dw,
                square=square,
                ratio=ratio,
                kmax=int(det_cfg["max_detections"]),
                depth_mode=self.depth_mode,
                labeler=self.labeler,
                label_budget=int(det_cfg["max_label_boxes"]),
                scale_box=float(det_cfg["scale_box"]),
                clip_coeff=float(self.cfg["box_fusion"]["clip_sim_coeff"]),
                raw_score_thresh=float(det_cfg["score_thresh"]),
                label_bucketing=bool(det_cfg.get("label_bucketing", True)),
            )
            self._fused_fns[key] = fn
        return fn

    def _pack_buffer(self, frame) -> np.ndarray:
        dh, dw = frame.depth.shape[:2]
        if self._pack_scratch is None or self._pack_scratch.shape != (dh, dw):
            self._pack_scratch = np.empty((dh, dw), np.float32)
        return pack_fused_buffer(frame, self.count, self.depth_mode,
                                 self.depth_scale,
                                 scratch=self._pack_scratch)

    def _fused_step(self, fn, buf: np.ndarray) -> None:
        try:
            # every operand pins to self.device (params may be committed to
            # another device by the caller's init; mixed committed devices
            # make the jitted call raise).  One placement per params object,
            # keyed on identity so a swapped detector (eval fan-out) re-pins.
            if self._params_dev is None or self._params_dev[0] is not self.detector.params:
                src = self.detector.params
                self._params_dev = (
                    src,
                    jax.device_put(src, self.device) if self.device is not None else src,
                )
            if self.labeler is not None:
                if (
                    self._clip_params_dev is None
                    or self._clip_params_dev[0] is not self.labeler.params
                ):
                    src = self.labeler.params
                    self._clip_params_dev = (
                        src,
                        jax.device_put(src, self.device)
                        if self.device is not None
                        else src,
                    )
                if self._text_features_dev is None:
                    self._text_features_dev = jax.device_put(
                        np.asarray(self.labeler.text_features, np.float32),
                        self.device,
                    )
                clip_params, tf = self._clip_params_dev[1], self._text_features_dev
            else:
                clip_params = tf = None
            # label-budget overflow rides in state.stats[4]; NO eager ops or
            # D2H here (a mid-sequence D2H degrades the tunnel permanently)
            self.state = fn(
                self._params_dev[1],
                clip_params,
                tf,
                self.state,
                jax.device_put(buf, self.device),
                self.pst,
            )
        except BaseException as e:  # surfaced on the next submit/flush
            self._worker_error = e
            raise

    def process_keyframe(self, frame) -> None:
        self._raise_worker_error()
        if frame.depth is None:
            # depth-less frames (rgb-only capture) take the parent's path;
            # the fused buffer layout assumes a depth plane.  Pending chunked
            # keyframes must dispatch first to keep state order.
            if self._pending:
                self._flush_pending()
            return super().process_keyframe(frame)
        square, ratio = resolve_pad_and_ratio(
            frame.image, frame.depth, self.detector.buckets
        )
        h, w = frame.image.shape[:2]
        dh, dw = frame.depth.shape[:2]
        shape_key = (h, w, dh, dw, square, ratio)
        buf = self._pack_buffer(frame)
        chunk = self._chunk_effective
        if chunk == 1:
            # a gap change mid-stream (run() auto-resolution) must not strand
            # buffered keyframes from an earlier chunked phase
            if self._pending:
                self._flush_pending()
            fn = self._get_fused(shape_key)
            self._last = self._executor.submit(self._fused_step, fn, buf)
            return
        # chunked throughput mode: group consecutive same-shape keyframes;
        # a shape-bucket change flushes the partial group (sequential path)
        # so state order is preserved
        if self._pending and self._pending[0][0] != shape_key:
            self._flush_pending()
        self._pending.append((shape_key, buf))
        if len(self._pending) == chunk:
            fn = self._get_fused(shape_key, chunk=chunk)
            bufs = np.stack([b for _, b in self._pending])
            self._pending.clear()
            self._last = self._executor.submit(self._fused_step, fn, bufs)

    def _flush_pending(self) -> None:
        """Dispatch a partial chunk through the per-frame program (keeps
        decision order identical; only the last < chunk keyframes pay the
        unamortized cost)."""
        for shape_key, buf in self._pending:
            fn = self._get_fused(shape_key)
            self._last = self._executor.submit(self._fused_step, fn, buf)
        self._pending.clear()

    def flush(self) -> None:
        if self._pending:
            self._flush_pending()
        super().flush()

    def run(self, dataset, gap=None, verbose: bool = False, export: bool = True):
        # r5 A/B: chunking wins at every gap (see __init__), so the former
        # gap>chunk auto-disable is gone and chunk applies as given
        self._chunk_effective = self.chunk
        try:
            return super().run(dataset, gap=gap, verbose=verbose, export=export)
        finally:
            self._chunk_effective = self.chunk

    def reset(self) -> None:
        self._pending.clear()
        super().reset()

    def restore_state(self, path: str, count: int = 0) -> None:
        # keyframes buffered pre-restore belong to the replaced timeline;
        # dispatching them on top of the restored state would corrupt it
        self._pending.clear()
        super().restore_state(path, count)

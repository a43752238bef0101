"""The fully device-resident keyframe update.

One jitted function per keyframe: ``keyframe_step(state, detections, ...)
-> DeviceState``.  Implements, entirely on device with fixed shapes:

  * detection filters (score / uv-bound / floor / max-size,
    reference demo.py:138-148, box_manager.py:217-245);
  * camera->world lift + observation corner projection (demo.py:216-221);
  * the two-phase gated pairwise OBB IoU cache refresh;
  * greedy score-ordered 3D NMS with the manager's fusion-list bookkeeping
    (instances.py:22-101 + box_manager.py:40-88) as a ``lax.while_loop``
    whose body mutates masks -- faithful to the sequential reference
    semantics, including keep-swaps;
  * the small-object 2D correspondence pass (instances.py:411-490 +
    box_manager.py:90-129);
  * world-set compaction (stable-order mask sort == the reference's sorted
    keep lists);
  * batched multi-view PST fusion (box_fusion.py:622-724) and the IoU cache
    refresh for moved boxes.

The host only enqueues: no values come back until the end of the sequence,
so per-keyframe cost is dispatch latency + device compute even on
remote-attached TPUs.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from boxfusion_tpu.fusion.optimizer import PSTOptConfig, init_opt_params, optimize_boxes
from boxfusion_tpu.geometry.boxes import box_corners
from boxfusion_tpu.geometry.iou import MAX_GATED_PAIRS, gated_pair_iou, iou_2d
from boxfusion_tpu.geometry.projection import (
    project_boxes_to_2d,
    project_corners_to_image,
)
from boxfusion_tpu.runtime.device_state import PAD_ID, DeviceState

_NEG = jnp.float32(-1e30)


def _argmax_score_desc(scores, mask):
    """Index of the max masked score, ties broken by LARGER index.

    Matches the reference's ``scores.argsort()[::-1]`` ordering
    (instances.py:52): a reversed stable ascending sort puts the later index
    first among equal scores.
    """
    s = jnp.where(mask, scores, _NEG)
    m = jnp.max(s)
    slot = jnp.arange(s.shape[0])
    return jnp.argmax(jnp.where(s == m, slot + 1, 0))


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static per-run configuration (mirrors the YAML, utils/config.py)."""

    score_thresh: float = 0.4
    uv_bound: bool = True
    uv_bound_value: float = 0.9
    floor_mask: bool = True
    floor_ratio: float = 15.0
    size_max_thres: float = 0.0
    nms_threshold: float = 0.1
    small_threshold: float = 0.2
    small_size: float = 0.5
    rotation_gap: float = 30.0
    translation_gap: float = 0.8
    fusion_use: bool = True
    max_fusions: int = 16
    # the shared gate->top_k->pair-IoU budget (geometry/iou.py::
    # gated_pair_iou); same default as the host engine's MAX_GATED_PAIRS
    max_gated_pairs: int = MAX_GATED_PAIRS
    grid_samples: int = 25
    check_valid: bool = False  # drop never-re-observed boxes (box_manager.py:151-166)
    gap: int = 20
    # Unrolled-engine compile budgets.  The straight-line NMS replay
    # (_nms_greedy_unrolled) emits one cond-gated body per Jacobi sweep and
    # per suppression record; bounding the chains by these budgets instead
    # of the world capacity keeps trace+compile time INDEPENDENT of
    # capacity (a 2048-slot world would otherwise unroll 2x2048 bodies --
    # minutes of compile) and shortens the serial dispatch chain at gap=1.
    # Decisions are identical to the while-loop engine whenever the budgets
    # cover the scene (sweeps >= greedy dependency depth, records >= boxes
    # suppressed this keyframe); exhaustion is surfaced in stats[7]
    # ("nms_budget_exhausted"), never silent.  Real indoor scenes measure
    # depth < 10 and records < 2x detections; the defaults are far above.
    max_nms_sweeps: int = 64
    max_nms_records: int = 256
    # Loop engine: "loops" = lax.while_loop NMS/correspondence (compact HLO,
    # fast compiles -- the right choice on CPU and healthy backends);
    # "unrolled" = straight-line cond-gated replay with IDENTICAL decisions,
    # for backends whose while-loop dispatch path is pathological (the axon
    # tunnel degradation, docs/TUNNEL_PERF_NOTES.md).  Pipelines resolve
    # "auto" per backend before constructing this config.
    engine: str = "loops"
    opt: PSTOptConfig = PSTOptConfig()


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------

def _pose_differs(poses_m, pose_ref, cfg: StepConfig):
    """(V, 4, 4) vs (4, 4) -> (V,) bool (box_manager.py:168-186)."""
    baseline = jnp.linalg.norm(poses_m[:, :3, 3] - pose_ref[:3, 3], axis=-1)
    r_rel = jnp.einsum(
        "ij,vkj->vik", pose_ref[:3, :3], poses_m[:, :3, :3],
        precision=jax.lax.Precision.HIGHEST,  # angle gates need f32 rotations
    )
    tr = jnp.clip((jnp.trace(r_rel, axis1=1, axis2=2) - 1) / 2, -1.0, 1.0)
    ang = jnp.arccos(tr) * (180.0 / jnp.pi)
    return (baseline > cfg.translation_gap) | (ang > cfg.rotation_gap)


def _insert_sorted(row, count, value):
    """Insert into a PAD_ID-padded ascending row."""
    new = jax.lax.dynamic_update_slice(row, value[None].astype(row.dtype), (count,))
    return jnp.sort(new)


def _merge_sorted(row_a, count_a, row_b, count_b, max_views):
    merged = jnp.sort(jnp.concatenate([row_a, row_b]))[:max_views]
    return merged, jnp.minimum(count_a + count_b, max_views)


# ---------------------------------------------------------------------------
# greedy NMS + record (instances.py:22-101, box_manager.py:40-88)
# ---------------------------------------------------------------------------

def _record_core(flist, fcount, fflag, keep, i, j, extra, obs_pose, init_id,
                 cfg: StepConfig):
    """Process one suppressed/merged box j against survivor i -- the shared
    bookkeeping of record (box_manager.py:48-87) and record_corr
    (box_manager.py:90-129).  ``extra`` is the center-distance escape hatch
    of record (box_manager.py:53-55); record_corr passes False.

    Operates on the small mutable field set only (flist/fcount/fflag/keep) so
    the unrolled engine can thread exactly these through its cond chain."""
    V = flist.shape[1]
    obs_cap = obs_pose.shape[0]
    is_single = fcount[j] == 1

    def members_differ(list_slot, pose_ref):
        row = flist[list_slot]
        idx = jnp.clip(row, 0, obs_cap - 1)
        differs = _pose_differs(obs_pose[idx], pose_ref, cfg) | extra
        m = jnp.arange(V) < fcount[list_slot]
        return jnp.all(jnp.where(m, differs, True))

    # case A: j is a fresh observation -> maybe append its init_id to i's list
    pose_j = obs_pose[jnp.clip(init_id[j], 0, obs_cap - 1)]
    differ_a = members_differ(i, pose_j)
    apply_a = is_single & differ_a & (fcount[i] < 5)

    row_a = _insert_sorted(flist[i], fcount[i], init_id[j])

    # case B: j is a multi-view box -> maybe merge its list into i's
    pose_i = obs_pose[jnp.clip(init_id[i], 0, obs_cap - 1)]
    differ_b = members_differ(j, pose_i)
    mergeable = differ_b & (fcount[j] < 5)
    apply_b = (~is_single) & mergeable
    swap_b = (~is_single) & (~mergeable)

    row_b, count_b = _merge_sorted(flist[i], fcount[i], flist[j], fcount[j], V)
    # no-silent-caps: a case-B merge of two lists can exceed the V-slot row
    # and _merge_sorted keeps only the V smallest obs ids; the reference's
    # Python lists are unbounded here (box_manager.py:59-77), so surface the
    # dropped-member count (stats[5]) instead of silently diverging.
    # Computed from the PRE-merge counts -- fcount[i] is overwritten below.
    trunc = jnp.where(
        apply_b, jnp.maximum(fcount[i] + fcount[j] - V, 0), 0
    ).astype(jnp.int32)

    new_row = jnp.where(apply_a, row_a, jnp.where(apply_b, row_b, flist[i]))
    new_count = jnp.where(apply_a, fcount[i] + 1, jnp.where(apply_b, count_b, fcount[i]))
    flist = jax.lax.dynamic_update_slice(flist, new_row[None], (i, 0))
    fcount = fcount.at[i].set(new_count)

    # keep-swap (box_manager.py:79-83): old multi-view box wins over cur.
    do_swap = swap_b & keep[i]
    keep = keep.at[i].set(jnp.where(do_swap, False, keep[i]))
    keep = keep.at[j].set(jnp.where(do_swap, True, keep[j]))

    fflag = fflag.at[i].set(fflag[i] | ((~is_single) & fflag[j]))
    return flist, fcount, fflag, keep, trunc


def _record_one(state: DeviceState, keep, i, j, cfg: StepConfig):
    """Process one suppressed box j against survivor i (box_manager.py:48-87)."""
    center_far = jnp.linalg.norm(state.xyzlhw[i, :3] - state.xyzlhw[j, :3]) > 0.5
    flist, fcount, fflag, keep, trunc = _record_core(
        state.flist, state.fcount, state.fflag, keep, i, j, center_far,
        state.obs_pose, state.init_id, cfg,
    )
    return dataclasses.replace(
        state, flist=flist, fcount=fcount, fflag=fflag,
        stats=state.stats.at[5].add(trunc),
    ), keep


def _nms_greedy(state: DeviceState, cfg: StepConfig):
    """Greedy score-ordered NMS over the packed world set.

    Returns (state, keep (G,), success (G,))."""
    G = state.capacity
    slot_valid = jnp.arange(G) < state.n

    # Exact shortcut: a box whose cached IoU against every other alive box is
    # <= threshold can neither suppress nor be suppressed, and greedy NMS
    # never mutates it (keep=True, no valid_num/success/record changes), so
    # it can be kept without a loop iteration.  Removing it from the score
    # order cannot change any other decision because all its pair IoUs fail
    # the threshold.  This bounds the serial while_loop to the overlap graph
    # (~the new detections and their neighbours) instead of the whole world
    # set -- the dominant device cost at high detection loads.
    # The cache may be ASYMMETRIC when max_gated_pairs truncation drops one
    # direction of a pair (_gated_iou_rows), so a box counts as contested if
    # its row OR its column has any above-threshold entry.
    pair_on = (
        (state.iou > cfg.nms_threshold)
        & slot_valid[None, :]
        & slot_valid[:, None]
    )
    contested = jnp.any(pair_on, axis=1) | jnp.any(pair_on, axis=0)
    isolated = slot_valid & ~contested

    def outer_cond(c):
        _, remaining, *_ = c
        return jnp.any(remaining)

    def outer_body(c):
        state, remaining, keep, success = c
        i = _argmax_score_desc(state.scores, remaining)
        keep = keep.at[i].set(True)
        remaining = remaining.at[i].set(False)

        ious = state.iou[i] * remaining
        supp = remaining & (ious > cfg.nms_threshold)
        remaining = remaining & ~supp

        any_supp = jnp.any(supp)
        valid_num = state.valid_num.at[i].add(jnp.where(any_supp, 1.0, 0.0))
        success = success.at[i].set(success[i] | any_supp)
        state = dataclasses.replace(state, valid_num=valid_num)

        # inner: process suppressed in score-descending order
        def inner_cond(ic):
            supp_mask, *_ = ic
            return jnp.any(supp_mask)

        def inner_body(ic):
            supp_mask, state, keep = ic
            j = _argmax_score_desc(state.scores, supp_mask)
            supp_mask = supp_mask.at[j].set(False)
            state, keep = _record_one(state, keep, i, j, cfg)
            return supp_mask, state, keep

        _, state, keep = jax.lax.while_loop(
            inner_cond, inner_body, (supp, state, keep)
        )
        return state, remaining, keep, success

    state, _, keep, success = jax.lax.while_loop(
        outer_cond,
        outer_body,
        (state, contested, isolated, jnp.zeros(G, bool)),
    )
    return state, keep, success


def _score_rank(scores):
    """rank[slot] = pick position under score-descending order with ties
    broken by LARGER slot index -- the total order realized by repeatedly
    calling ``_argmax_score_desc`` (reference ``scores.argsort()[::-1]``,
    instances.py:52).  A stable ascending argsort keeps ties in ascending
    slot order; reversing it yields score-descending, ties slot-descending."""
    order = jnp.argsort(scores, stable=True)[::-1]
    return jnp.argsort(order)


def _nms_greedy_unrolled(state: DeviceState, cfg: StepConfig):
    """``_nms_greedy`` without loop primitives (straight-line HLO).

    Identical decisions to the ``lax.while_loop`` engine, restructured for
    backends where while-loop dispatch is pathological (the tunnel
    degradation of docs/TUNNEL_PERF_NOTES.md -- fixed-trip scans poison
    identically, fully unrolled programs stay clean):

      phase 1: the greedy survivor set and each suppressed box's suppressor
        are pure functions of (score order, IoU cache) -- keep-swaps inside
        ``record`` never touch the ``remaining`` mask -- so they are computed
        by a Jacobi fixed-point ladder (after t sweeps every box whose
        suppressor-dependency depth <= t is settled; G sweeps are exact,
        convergence is detected and later sweeps skip via ``lax.cond``);
      phase 2: the manager bookkeeping IS order-sensitive (box_manager.py:
        40-88 mutates fusion lists the next record reads), so records replay
        in the exact loop order -- (survivor pick order, then score-desc
        within a survivor's batch) -- as a chain of cond-gated bodies that
        thread only the small mutable fields.
    """
    G = state.capacity
    slot_valid = jnp.arange(G) < state.n

    pair_on = (
        (state.iou > cfg.nms_threshold)
        & slot_valid[None, :]
        & slot_valid[:, None]
    )
    contested = jnp.any(pair_on, axis=1) | jnp.any(pair_on, axis=0)
    isolated = slot_valid & ~contested

    rank = _score_rank(state.scores)
    earlier = rank[:, None] < rank[None, :]
    # M[s, i]: survivor s would suppress i (row-of-s IoU, like the loop's
    # ``state.iou[i] * remaining`` with i as the picked survivor; the cache
    # may be asymmetric under pair-budget truncation)
    M = pair_on & earlier

    # phase 1: Jacobi sweeps to the greedy fixed point, cond-skipped once
    # converged (a reached fixed point persists; G sweeps bound the depth)
    def sweep(c):
        surv, _ = c
        hit = jnp.any(M & surv[:, None], axis=0)
        new = contested & ~hit
        return new, jnp.any(new != surv)

    c = (contested, jnp.bool_(True))
    for _ in range(min(G, cfg.max_nms_sweeps)):
        c = jax.lax.cond(c[1], sweep, lambda a: a, c)
    surv = c[0]
    # c[1] still True = the last executed sweep changed something, so the
    # fixed point was not yet CONFIRMED within the budget (stats[7])
    sweeps_short = c[1].astype(jnp.int32)

    suppressed = contested & ~surv
    # suppressor(j) = earliest-pick survivor with M[s, j] (greedy removes j
    # from ``remaining`` at its first suppression)
    sup_key = jnp.where(M & surv[:, None], rank[:, None], 2 * G)
    sup_of = jnp.argmin(sup_key, axis=0)

    # per-survivor side effects of the outer loop (once per pick)
    got = jnp.zeros(G, jnp.float32).at[sup_of].add(
        jnp.where(suppressed, 1.0, 0.0)
    )
    any_supp = got > 0
    state = dataclasses.replace(
        state, valid_num=state.valid_num + jnp.where(any_supp, 1.0, 0.0)
    )
    success = any_supp
    keep = isolated | surv

    # phase 2: replay records in loop order (survivor rank, then box rank)
    big = jnp.int32(2 * G * G)
    prio = jnp.where(suppressed, rank[sup_of] * G + rank, big)

    def rec(c):
        flist, fcount, fflag, keep, prio, trunc_acc = c
        j = jnp.argmin(prio)
        i = sup_of[j]
        prio = prio.at[j].set(big)
        center_far = (
            jnp.linalg.norm(state.xyzlhw[i, :3] - state.xyzlhw[j, :3]) > 0.5
        )
        flist, fcount, fflag, keep, trunc = _record_core(
            flist, fcount, fflag, keep, i, j, center_far,
            state.obs_pose, state.init_id, cfg,
        )
        return flist, fcount, fflag, keep, prio, trunc_acc + trunc

    c = (state.flist, state.fcount, state.fflag, keep, prio, jnp.int32(0))
    for _ in range(min(G, cfg.max_nms_records)):
        c = jax.lax.cond(jnp.min(c[4]) < big, rec, lambda a: a, c)
    flist, fcount, fflag, keep, prio_left, trunc_acc = c
    # records the budget never replayed (their manager bookkeeping is LOST
    # relative to the reference -- surfaced, never silent)
    records_short = jnp.sum(prio_left < big).astype(jnp.int32)

    state = dataclasses.replace(
        state, flist=flist, fcount=fcount, fflag=fflag,
        stats=state.stats.at[5].add(trunc_acc).at[7].add(
            sweeps_short + records_short
        ),
    )
    return state, keep, success


# ---------------------------------------------------------------------------
# correspondence pass (instances.py:411-490, box_manager.py:90-129)
# ---------------------------------------------------------------------------

_iou2d_one_vs_rows = iou_2d  # one xyxy box vs N rows (geometry/iou.py:34)


def _record_corr_one(state: DeviceState, keep, cur, other, cfg: StepConfig):
    """record_corr (box_manager.py:90-129): the record bookkeeping with a
    pose-only gate (no center-distance escape hatch -> extra=False) and the
    keep-substitute semantics of box_manager.py:122-123."""
    flist, fcount, fflag, keep, trunc = _record_core(
        state.flist, state.fcount, state.fflag, keep, cur, other,
        jnp.bool_(False), state.obs_pose, state.init_id, cfg,
    )
    return dataclasses.replace(
        state, flist=flist, fcount=fcount, fflag=fflag,
        stats=state.stats.at[5].add(trunc),
    ), keep


def _correspondence(state, keep, success, n_before, proj2d, cfg: StepConfig):
    G = state.capacity
    slot = jnp.arange(G)

    # fixed at entry, like the reference (instances.py:424)
    global_keep = keep & (slot < n_before)
    small_dims_g = jnp.max(state.xyzlhw[:, 3:], axis=-1) < (cfg.small_size + 0.1)

    is_new = slot >= n_before
    small_new = (
        keep
        & is_new
        & (jnp.max(state.xyzlhw[:, 3:], axis=-1) <= cfg.small_size)
        & ~success
        & (slot < state.n)
    )
    have_globals = jnp.any(global_keep)

    def cond(c):
        pending, *_ = c
        return jnp.any(pending) & have_globals

    def body(c):
        pending, state, keep = c
        s = jnp.argmin(jnp.where(pending, slot, G + 1))  # ascending slot order
        pending = pending.at[s].set(False)

        iou = _iou2d_one_vs_rows(state.pred_boxes[s], proj2d)
        # where (not multiply) so NaNs from degenerate projections of masked
        # slots cannot leak into the argmax
        iou = jnp.where(global_keep & small_dims_g, iou, 0.0)
        best = jnp.argmax(iou)
        hit = iou[best] > cfg.small_threshold

        new_wins = state.scores[best] < state.scores[s]

        def do_new_wins(args):
            state, keep = args
            keep = keep.at[best].set(False)
            vn = state.valid_num.at[s].add(1.0)
            state = dataclasses.replace(state, valid_num=vn)
            return _record_corr_one(state, keep, s, best, cfg)

        def do_old_wins(args):
            state, keep = args
            keep = keep.at[s].set(False)
            vn = state.valid_num.at[best].add(1.0)
            state = dataclasses.replace(state, valid_num=vn)
            return _record_corr_one(state, keep, best, s, cfg)

        def do_hit(args):
            return jax.lax.cond(new_wins, do_new_wins, do_old_wins, args)

        state, keep = jax.lax.cond(hit, do_hit, lambda a: a, (state, keep))
        return pending, state, keep

    _, state, keep = jax.lax.while_loop(cond, body, (small_new, state, keep))
    return state, keep


def _correspondence_unrolled(state, keep, success, n_before, proj2d, cfg: StepConfig,
                             kmax: int):
    """``_correspondence`` without loop primitives (see ``_nms_greedy_unrolled``).

    The pending set is fixed at entry (small NEW kept boxes, instances.py:424)
    and only shrinks, so the while-loop is replaced by ``kmax`` cond-gated
    bodies (at most one pending box per appended detection), each threading
    the small mutable fields."""
    G = state.capacity
    slot = jnp.arange(G)

    global_keep = keep & (slot < n_before)
    small_dims_g = jnp.max(state.xyzlhw[:, 3:], axis=-1) < (cfg.small_size + 0.1)

    is_new = slot >= n_before
    small_new = (
        keep
        & is_new
        & (jnp.max(state.xyzlhw[:, 3:], axis=-1) <= cfg.small_size)
        & ~success
        & (slot < state.n)
    )
    have_globals = jnp.any(global_keep)

    def body(c):
        pending, flist, fcount, fflag, keep, valid_num, trunc_acc = c
        s = jnp.argmin(jnp.where(pending, slot, G + 1))  # ascending slot order
        pending = pending.at[s].set(False)

        iou = _iou2d_one_vs_rows(state.pred_boxes[s], proj2d)
        iou = jnp.where(global_keep & small_dims_g, iou, 0.0)
        best = jnp.argmax(iou)
        hit = iou[best] > cfg.small_threshold

        new_wins = state.scores[best] < state.scores[s]
        no_extra = jnp.bool_(False)

        def do_new_wins(args):
            flist, fcount, fflag, keep, valid_num, trunc_acc = args
            keep = keep.at[best].set(False)
            valid_num = valid_num.at[s].add(1.0)
            flist, fcount, fflag, keep, trunc = _record_core(
                flist, fcount, fflag, keep, s, best, no_extra,
                state.obs_pose, state.init_id, cfg,
            )
            return flist, fcount, fflag, keep, valid_num, trunc_acc + trunc

        def do_old_wins(args):
            flist, fcount, fflag, keep, valid_num, trunc_acc = args
            keep = keep.at[s].set(False)
            valid_num = valid_num.at[best].add(1.0)
            flist, fcount, fflag, keep, trunc = _record_core(
                flist, fcount, fflag, keep, best, s, no_extra,
                state.obs_pose, state.init_id, cfg,
            )
            return flist, fcount, fflag, keep, valid_num, trunc_acc + trunc

        def do_hit(args):
            return jax.lax.cond(new_wins, do_new_wins, do_old_wins, args)

        flist, fcount, fflag, keep, valid_num, trunc_acc = jax.lax.cond(
            hit, do_hit, lambda a: a,
            (flist, fcount, fflag, keep, valid_num, trunc_acc),
        )
        return pending, flist, fcount, fflag, keep, valid_num, trunc_acc

    c = (
        small_new, state.flist, state.fcount, state.fflag, keep,
        state.valid_num, jnp.int32(0),
    )
    for _ in range(min(kmax, G)):
        c = jax.lax.cond(jnp.any(c[0]) & have_globals, body, lambda a: a, c)
    _, flist, fcount, fflag, keep, valid_num, trunc_acc = c
    state = dataclasses.replace(
        state, flist=flist, fcount=fcount, fflag=fflag, valid_num=valid_num,
        stats=state.stats.at[5].add(trunc_acc),
    )
    return state, keep


# ---------------------------------------------------------------------------
# compaction
# ---------------------------------------------------------------------------

def _compact(state: DeviceState, keep) -> DeviceState:
    G = state.capacity
    keep = keep & (jnp.arange(G) < state.n)
    order = jnp.argsort(~keep, stable=True)  # kept slots first, order stable
    new_n = jnp.sum(keep).astype(jnp.int32)

    def g(x):
        return x[order]

    return dataclasses.replace(
        state,
        xyzlhw=g(state.xyzlhw),
        R=g(state.R),
        scores=g(state.scores),
        category=g(state.category),
        pred_boxes=g(state.pred_boxes),
        init_id=g(state.init_id),
        frame_id=g(state.frame_id),
        valid_num=g(state.valid_num),
        n=new_n,
        iou=state.iou[order][:, order],
        flist=g(state.flist),
        fcount=g(state.fcount),
        fflag=g(state.fflag),
        already=g(state.already),
        already_valid=g(state.already_valid),
    )


# ---------------------------------------------------------------------------
# gated pairwise IoU rows
# ---------------------------------------------------------------------------

def _gated_iou_rows(corners_q, mask_q, corners_all, mask_all, cfg: StepConfig):
    """(Q, A) IoU rows via the SHARED gate -> top-k -> pair-IoU sequence
    (geometry/iou.py::gated_pair_iou -- one implementation for both engines).

    Returns (rows, truncated): ``truncated`` counts gated pairs beyond the
    ``max_gated_pairs`` budget whose IoU was therefore NOT computed (their
    row entries stay 0) -- surfaced by the pipeline instead of silently
    weakening NMS on very dense scenes."""
    Q = corners_q.shape[0]
    A = corners_all.shape[0]
    pair_idx, vals, n_gated = gated_pair_iou(
        corners_q, mask_q, corners_all, mask_all,
        cfg.max_gated_pairs, cfg.grid_samples,
    )
    truncated = jnp.maximum(n_gated - pair_idx.shape[0], 0)
    rows = jnp.zeros(Q * A, jnp.float32).at[pair_idx].set(vals).reshape(Q, A)
    return rows, truncated


# ---------------------------------------------------------------------------
# fusion (box_fusion.py:622-724)
# ---------------------------------------------------------------------------

def _fuse_device(state: DeviceState, pst, K_img, H, W, cfg: StepConfig):
    G = state.capacity
    V = state.max_views
    F = cfg.max_fusions
    slot = jnp.arange(G)

    same_as_already = state.already_valid & jnp.all(state.flist == state.already, axis=-1)
    eligible = (state.fcount >= 3) & (slot < state.n) & ~same_as_already

    _, cand = jax.lax.top_k(eligible.astype(jnp.int32), F)  # ascending-index ties
    active = eligible[cand]
    # no-silent-caps: eligible slots beyond max_fusions are deferred to a
    # later keyframe (they only fuse then if that keyframe has new kept
    # boxes) -- count them (stats[6]) so eval stats never claim full
    # fusion coverage when slots were skipped
    deferred = jnp.maximum(jnp.sum(eligible.astype(jnp.int32)) - F, 0)
    state = dataclasses.replace(state, stats=state.stats.at[6].add(deferred))

    rows = state.flist[cand]  # (F, V)
    vmask = (jnp.arange(V)[None] < state.fcount[cand][:, None]) & active[:, None]
    obs_idx = jnp.clip(rows, 0, state.obs_pose.shape[0] - 1)

    mem_box = state.obs_xyzlhw[obs_idx]  # (F, V, 6)
    mem_R = state.obs_R[obs_idx]
    mem_score = state.obs_score[obs_idx]
    mem_pose = state.obs_pose[obs_idx]
    mem_corners = state.obs_corners2d[obs_idx]

    init_x, init_R = jax.vmap(init_opt_params)(
        mem_box, mem_R, mem_score, vmask.astype(jnp.float32)
    )

    fused, updated = optimize_boxes.__wrapped__(
        init_x,
        init_R,
        pst,
        mem_pose,
        mem_corners,
        vmask.astype(jnp.float32),
        active,
        K_img,
        H,
        W,
        cfg.opt,
    )

    # write back via one-hot masks (box_fusion.py:716-724: only the tensor
    # moves; the rotation stays the global box's own R)
    upd_onehot = jnp.zeros(G, bool).at[cand].set(updated)  # cand unique
    sel = jax.nn.one_hot(cand, G, dtype=jnp.float32) * updated[:, None]  # (F, G)
    # one-hot selection: HIGHEST keeps the fused coordinates bit-exact (a
    # bf16 MXU pass would round them to ~3 digits)
    fused_rows = jnp.matmul(sel.T, fused, precision=jax.lax.Precision.HIGHEST)  # (G, 6)
    xyzlhw = jnp.where(upd_onehot[:, None], fused_rows, state.xyzlhw)

    fflag = state.fflag | upd_onehot
    already = jnp.where(upd_onehot[:, None], state.flist, state.already)
    already_valid = state.already_valid | upd_onehot

    state = dataclasses.replace(
        state, xyzlhw=xyzlhw, fflag=fflag, already=already, already_valid=already_valid
    )

    # refresh IoU cache rows for moved boxes
    corners_all = box_corners(state.xyzlhw, state.R)
    mask_all = slot < state.n
    corners_q = corners_all[cand]
    rows_iou, truncated = _gated_iou_rows(corners_q, updated, corners_all, mask_all, cfg)
    state = dataclasses.replace(state, stats=state.stats.at[2].add(truncated))
    rows_full = jnp.matmul(
        (jax.nn.one_hot(cand, G, dtype=jnp.float32) * updated[:, None]).T,
        rows_iou,
        precision=jax.lax.Precision.HIGHEST,
    )
    iou = jnp.where(upd_onehot[:, None], rows_full, state.iou)
    iou = jnp.where(upd_onehot[None, :], rows_full.T, iou)
    iou = iou * (1.0 - jnp.eye(G))
    return dataclasses.replace(state, iou=iou)


# ---------------------------------------------------------------------------
# detection filters + append
# ---------------------------------------------------------------------------

def _filter_mask(det, image_hw, cfg: StepConfig):
    """demo.py:138-148 + box_manager.py:217-245, vectorized."""
    h, w = image_hw[0], image_hw[1]
    m = det["scores"] >= cfg.score_thresh
    if cfg.uv_bound:
        gap_w = jnp.floor((1.0 - cfg.uv_bound_value) * w)
        gap_h = jnp.floor((1.0 - cfg.uv_bound_value) * h)
        u, v = det["proj_xy"][:, 0], det["proj_xy"][:, 1]
        m &= (u > gap_w) & (u < (w - gap_w)) & (v > gap_h) & (v < (h - gap_h))
    dims = det["boxes3d"][:, 3:]
    if cfg.floor_mask:
        mx = jnp.max(dims, axis=1)
        mn = jnp.min(dims, axis=1)
        second = jnp.sort(dims, axis=1)[:, 1]
        floor = (mx / mn > cfg.floor_ratio) | (
            (mx / mn > cfg.floor_ratio / 2)
            & (mx / second > cfg.floor_ratio / 2)
            & (second / mn < 2.0)
            & (second < 0.15)
            & (mn < 0.15)
        )
        m &= ~floor
    if cfg.size_max_thres > 0:
        m &= ~(jnp.max(dims, axis=1) > cfg.size_max_thres)
    return m


def _append_detections(state: DeviceState, det, mask, pose, K_depth, image_hw, frame_idx):
    """Pack the surviving detections, lift to world, append to the
    observation store + world set (demo.py:216-254).

    Appends are clamped to the remaining world/observation capacity and
    written with out-of-bounds-dropping scatters: a full buffer drops the
    lowest-priority new detections instead of silently overwriting live rows
    (dynamic_update_slice would clamp the start index when n > capacity-K)."""
    K = mask.shape[0]
    order = jnp.argsort(~mask, stable=True)
    k_want = jnp.sum(mask).astype(jnp.int32)
    k_world = jnp.minimum(k_want, state.capacity - state.n)
    k = jnp.minimum(k_world, state.obs_pose.shape[0] - state.obs_n)
    # no-silent-caps: count what the fixed capacities dropped
    stats = state.stats.at[0].add(k_want - k_world).at[1].add(k_world - k)
    state = dataclasses.replace(state, stats=stats)
    row = jnp.arange(K, dtype=jnp.int32)

    def pick(x):
        return x[order]

    boxes3d = pick(det["boxes3d"])
    R_cam = pick(det["R"])
    scores = pick(det["scores"])
    boxes2d = pick(det["pred_boxes"])
    category = pick(det["category"]) if "category" in det else jnp.zeros(K, jnp.int32)

    rp = pose[:3, :3]
    t = pose[:3, 3]
    hi = jax.lax.Precision.HIGHEST  # world lift is coordinate math
    centers_w = jnp.matmul(boxes3d[:, :3], rp.T, precision=hi) + t
    xyzlhw_w = jnp.concatenate([centers_w, boxes3d[:, 3:]], axis=1)
    R_w = jnp.einsum("ij,njk->nik", rp, R_cam, precision=hi)

    corners3d = box_corners(xyzlhw_w, R_w)
    poses_rep = jnp.broadcast_to(pose[None], (K, 4, 4))
    corners2d = project_corners_to_image(
        corners3d, poses_rep, K_depth, image_hw[0], image_hw[1]
    )

    obs_ids = state.obs_n + row

    def _append_block(buf, block, n_counter):
        """dynamic_update_slice at ``n_counter`` that stays safe when the
        buffer is nearly full: XLA clamps the start to cap-K, so the block is
        pre-merged with the existing rows it would otherwise overwrite (a
        contiguous slice + roll + where -- far cheaper than a scatter)."""
        block = block.astype(buf.dtype)
        # a block wider than the whole buffer can only ever land its first
        # `capacity` rows (k is clamped to capacity - n upstream); trimming
        # keeps the slice sizes legal when max_detections > capacity
        block = block[: buf.shape[0]]
        rows = block.shape[0]
        o = jnp.minimum(n_counter, buf.shape[0] - rows)
        shift = n_counter - o  # > 0 only when nearly full

        def merged_block(_):
            existing = jax.lax.dynamic_slice_in_dim(buf, o, rows)
            rolled = jnp.roll(block, shift, axis=0)
            keep_old = (jnp.arange(rows) < shift).reshape(
                (rows,) + (1,) * (block.ndim - 1)
            )
            return jnp.where(keep_old, existing, rolled)

        out = jax.lax.cond(shift > 0, merged_block, lambda _: block, None)
        return jax.lax.dynamic_update_slice_in_dim(buf, out, o, 0)

    def dus(buf, block):
        return _append_block(buf, block, state.obs_n)

    state = dataclasses.replace(
        state,
        obs_pose=dus(state.obs_pose, poses_rep),
        obs_xyzlhw=dus(state.obs_xyzlhw, xyzlhw_w),
        obs_R=dus(state.obs_R, R_w),
        obs_score=dus(state.obs_score, scores),
        obs_corners2d=dus(state.obs_corners2d, corners2d),
        obs_n=state.obs_n + k,
    )

    def wus(buf, block):
        return _append_block(buf, block, state.n)

    V = state.max_views
    new_flist = jnp.full((K, V), PAD_ID, jnp.int32).at[:, 0].set(obs_ids)
    state = dataclasses.replace(
        state,
        xyzlhw=wus(state.xyzlhw, xyzlhw_w),
        R=wus(state.R, R_w),
        scores=wus(state.scores, scores),
        category=wus(state.category, category),
        pred_boxes=wus(state.pred_boxes, boxes2d),
        init_id=wus(state.init_id, obs_ids),
        frame_id=wus(state.frame_id, jnp.full(K, frame_idx, jnp.int32)),
        valid_num=wus(state.valid_num, jnp.zeros(K)),
        flist=wus(state.flist, new_flist),
        fcount=wus(state.fcount, jnp.ones(K, jnp.int32)),
        fflag=wus(state.fflag, jnp.zeros(K, bool)),
        already=wus(state.already, jnp.full((K, V), PAD_ID, jnp.int32)),
        already_valid=wus(state.already_valid, jnp.zeros(K, bool)),
        n=state.n + k,
    )
    return state, k


# ---------------------------------------------------------------------------
# the keyframe step
# ---------------------------------------------------------------------------

def _keyframe_step_impl(
    state: DeviceState,
    det: dict,
    pst: jnp.ndarray,
    pose: jnp.ndarray,
    K_img: jnp.ndarray,
    K_depth: jnp.ndarray,
    image_hw: jnp.ndarray,
    frame_idx: jnp.ndarray,
    cfg: StepConfig,
) -> DeviceState:
    """One keyframe: filters -> append -> NMS -> correspondence -> fusion.

    Args:
      det: detector output dict (device arrays, fixed K rows): scores,
        pred_boxes, boxes3d (camera frame), R, proj_xy [, category].
      pose: (4, 4) camera-to-world of this keyframe.
      K_img / K_depth: (3, 3) intrinsics.  image_hw: (2,) actual (H, W).
    """
    G = state.capacity
    state = dataclasses.replace(state, stats=state.stats.at[3].add(1))
    mask = _filter_mask(det, image_hw, cfg)
    n_before = state.n
    state, k_new = _append_detections(
        state, det, mask, pose, K_depth, image_hw, frame_idx
    )

    def no_news(state):
        return state

    def with_news(state):
        slot = jnp.arange(G)
        mask_all = slot < state.n
        is_new = (slot >= n_before) & mask_all

        corners_all = box_corners(state.xyzlhw, state.R)

        # IoU cache rows for the new slots (two-phase gated).  The new slots
        # are a CONTIGUOUS window of at most kmax rows starting at n_before
        # (_append_detections), so the containment gate runs on a
        # (kmax, G) slice instead of the full (G, G) -- at capacity 2048 /
        # 100 detections that is 20x less gate work (the dominant
        # association cost), with identical results: gated pairs can only
        # come from is_new query rows, and their row-major order (hence the
        # MAX_GATED_PAIRS top-k selection) is preserved within the slice.
        kq = min(int(det["scores"].shape[0]), G)
        o = jnp.minimum(n_before, G - kq)
        corners_q = jax.lax.dynamic_slice_in_dim(corners_all, o, kq)
        mask_q = jax.lax.dynamic_slice_in_dim(is_new, o, kq)
        rows_q, truncated = _gated_iou_rows(
            corners_q, mask_q, corners_all, mask_all, cfg
        )
        rows = jax.lax.dynamic_update_slice(
            jnp.zeros((G, G), rows_q.dtype), rows_q, (o, jnp.int32(0))
        )
        iou = jnp.where(is_new[:, None], rows, state.iou)
        iou = jnp.where(is_new[None, :] & ~is_new[:, None], rows.T, iou)
        iou = iou * (1.0 - jnp.eye(G))
        state = dataclasses.replace(
            state, iou=iou, stats=state.stats.at[2].add(truncated)
        )

        first_frame = n_before == 0

        def assoc(state):
            if cfg.engine == "unrolled":
                state, keep, success = _nms_greedy_unrolled(state, cfg)
            else:
                state, keep, success = _nms_greedy(state, cfg)

            # 2D projections of the pre-NMS global set for correspondence
            proj2d = project_boxes_to_2d(
                corners_all, K_depth, pose, image_hw[0], image_hw[1]
            )
            any_new_kept = jnp.any(keep & is_new)

            kmax = det["scores"].shape[0]

            def corr(args):
                state, keep = args
                if cfg.engine == "unrolled":
                    return _correspondence_unrolled(
                        state, keep, success, n_before, proj2d, cfg, kmax
                    )
                return _correspondence(state, keep, success, n_before, proj2d, cfg)

            state, keep = jax.lax.cond(
                any_new_kept, corr, lambda a: a, (state, keep)
            )
            state = _compact(state, keep)

            if cfg.check_valid:
                # drop boxes never re-observed within one keyframe gap
                # (box_manager.py:151-166; gated by box_fusion.check_valid).
                # The reference runs this only when a new box survived NMS
                # (demo.py:270-298 `if len(cur_keep_idx) > 0`), like the
                # correspondence/fusion stages.
                def drop_stale(state):
                    alive = jnp.arange(G) < state.n
                    stale = (
                        alive
                        & (state.valid_num == 0)
                        & (state.frame_id < frame_idx - cfg.gap)
                    )
                    return _compact(state, alive & ~stale)

                state = jax.lax.cond(any_new_kept, drop_stale, lambda s: s, state)

            if cfg.fusion_use:
                def fuse(state):
                    return _fuse_device(state, pst, K_img, image_hw[0], image_hw[1], cfg)

                state = jax.lax.cond(any_new_kept, fuse, lambda s: s, state)
            return state

        return jax.lax.cond(first_frame, lambda s: s, assoc, state)

    return jax.lax.cond(k_new > 0, with_news, no_news, state)


# NOTE: the state is deliberately NOT donated.  Donation buys nothing on
# the tunneled axon backend (it was an early suspect in the dispatch-
# degradation bisect of docs/TUNNEL_PERF_NOTES.md, later exonerated), the
# un-donated copies cost microseconds, and an un-consumed state enables
# replay/debug reuse of a snapshot across steps.
@partial(jax.jit, static_argnames=("cfg",))
def keyframe_step(
    state: DeviceState,
    det: dict,
    pst: jnp.ndarray,
    pose: jnp.ndarray,
    K_img: jnp.ndarray,
    K_depth: jnp.ndarray,
    image_hw: jnp.ndarray,
    frame_idx: jnp.ndarray,
    cfg: StepConfig = StepConfig(),
) -> DeviceState:
    """Unpacked-argument entry point (see ``_keyframe_step_impl``)."""
    return _keyframe_step_impl(
        state, det, pst, pose, K_img, K_depth, image_hw, frame_idx, cfg
    )


# Packed host->device transfer boundary.  The tunneled single-chip setup pays
# ~0.5-0.7 ms per device_put; uploading the detection dict + frame metadata
# as ~10 separate small arrays costs more host time per keyframe than the
# whole device step.  The pipeline therefore ships exactly TWO arrays per
# keyframe: (K, 23) packed detections and a (37,) metadata vector.
DET_PACK_WIDTH = 23  # scores 1 | pred_boxes 4 | boxes3d 6 | R 9 | proj_xy 2 | category 1
META_WIDTH = 37  # pose 16 | K_img 9 | K_depth 9 | image_hw 2 | frame_idx 1


def _unpack_detections(packed: jnp.ndarray) -> dict:
    return dict(
        scores=packed[:, 0],
        pred_boxes=packed[:, 1:5],
        boxes3d=packed[:, 5:11],
        R=packed[:, 11:20].reshape(-1, 3, 3),
        proj_xy=packed[:, 20:22],
        category=packed[:, 22].astype(jnp.int32),
    )


def pad_detections(det: dict, kmax: int) -> dict:
    """Pad/truncate detector top-k rows to the static budget ``kmax``.

    Accepts single-frame ``(N, ...)`` or batched ``(B, N, ...)`` detection
    dicts (the row axis is scores' last axis).  One definition of the
    padding contract shared by ``keyframe_step_devdet`` and the vmapped
    ``BatchedPipeline`` step: padded rows get score -1e9 (below any
    filter), benign unit dims (downstream IoU math divides by volumes),
    zeroed geometry, and category 0 when the detector provides none (the
    labeler overwrites categories on the labeled path).
    """
    axis = det["scores"].ndim - 1
    k = min(int(det["scores"].shape[axis]), kmax)

    def pad(x, fill=0.0):
        x = jax.lax.slice_in_dim(x, 0, k, axis=axis)
        if k < kmax:
            pads = [(0, 0)] * x.ndim
            pads[axis] = (0, kmax - k)
            x = jnp.pad(x, pads, constant_values=jnp.asarray(fill, x.dtype))
        return x

    lead = det["scores"].shape[:axis]
    boxes3d = pad(det["boxes3d"])
    if k < kmax:
        boxes3d = boxes3d.at[..., k:, 3:].set(1.0)
    cat = det.get("category")
    if cat is None:
        cat = jnp.zeros(lead + (k,), jnp.int32)
    proj = det.get("proj_xy")
    if proj is None:
        proj = jnp.zeros(lead + (k, 2), det["scores"].dtype)
    return dict(
        scores=pad(det["scores"], -1e9),
        pred_boxes=pad(det["pred_boxes"]),
        boxes3d=boxes3d,
        R=pad(det["R"]),
        proj_xy=pad(proj),
        category=pad(cat).astype(jnp.int32),
    )


@partial(jax.jit, static_argnames=("cfg", "kmax"))
def keyframe_step_devdet(
    state: DeviceState,
    det: dict,
    meta: jnp.ndarray,
    pst: jnp.ndarray,
    cfg: StepConfig = StepConfig(),
    kmax: int = 100,
) -> DeviceState:
    """``keyframe_step`` taking DEVICE-resident detector outputs directly.

    The fast path for the real CuTR pipeline: the detector's top-k arrays
    never leave the device (no D2H sync, no host packing); only the (37,)
    metadata vector is uploaded per keyframe.  Padding/truncation to ``kmax``
    happens at trace time (detector top-k is static).
    """
    det = pad_detections(det, kmax)
    pose = meta[:16].reshape(4, 4)
    K_img = meta[16:25].reshape(3, 3)
    K_depth = meta[25:34].reshape(3, 3)
    image_hw = meta[34:36]
    frame_idx = meta[36].astype(jnp.int32)
    return _keyframe_step_impl(
        state, det, pst, pose, K_img, K_depth, image_hw, frame_idx, cfg
    )


@partial(jax.jit, static_argnames=("cfg",))
def keyframe_step_packed(
    state: DeviceState,
    buf: jnp.ndarray,
    pst: jnp.ndarray,
    cfg: StepConfig = StepConfig(),
) -> DeviceState:
    """``keyframe_step`` with a ONE-array transfer boundary (production path).

    ``buf`` is (K * DET_PACK_WIDTH + META_WIDTH,) float32: the packed
    detections followed by the metadata vector.  A single host array per
    keyframe means a single transfer RPC on tunneled single-chip setups,
    where every transfer/launch rides one serialized channel.
    """
    kmax = (buf.shape[0] - META_WIDTH) // DET_PACK_WIDTH
    det_packed = buf[: kmax * DET_PACK_WIDTH].reshape(kmax, DET_PACK_WIDTH)
    meta = buf[kmax * DET_PACK_WIDTH :]
    det = _unpack_detections(det_packed)
    pose = meta[:16].reshape(4, 4)
    K_img = meta[16:25].reshape(3, 3)
    K_depth = meta[25:34].reshape(3, 3)
    image_hw = meta[34:36]
    frame_idx = meta[36].astype(jnp.int32)
    return _keyframe_step_impl(
        state, det, pst, pose, K_img, K_depth, image_hw, frame_idx, cfg
    )

"""Bisect _nms_greedy internals for the tunnel-poisoning op."""
import dataclasses
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

sys.stdout = open("/tmp/probe10_out.txt", "w", buffering=1)

from boxfusion_tpu.geometry.boxes import box_corners
from boxfusion_tpu.runtime import device_step as ds
from boxfusion_tpu.runtime.device_state import init_state

img = np.random.randint(0, 255, (384, 512, 3), np.uint8)
dep = np.random.rand(384, 512).astype(np.float32)
N = 15


def put_ms(tag):
    for _ in range(3):
        r = jax.device_put((img, dep))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(N):
        r = jax.device_put((img, dep))
    jax.block_until_ready(r)
    print(f"  -> device_put after {tag}: {(time.perf_counter()-t0)/N*1000:7.2f} ms", flush=True)


cfg = ds.StepConfig(score_thresh=0.0, uv_bound=False, floor_mask=False,
                    size_max_thres=0.0, fusion_use=False)


def fresh_state_with_iou(seed):
    state = init_state(capacity=512, max_views=10, obs_capacity=4096)
    rng = np.random.RandomState(seed)
    n = 100
    det = {
        "scores": jnp.asarray(rng.rand(n).astype(np.float32)),
        "pred_boxes": jnp.asarray((rng.rand(n, 4) * 200).astype(np.float32)),
        "boxes3d": jnp.asarray(np.concatenate([rng.randn(n, 3), rng.rand(n, 3) * 0.5 + 0.2], 1).astype(np.float32)),
        "R": jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1)),
        "proj_xy": jnp.asarray((rng.rand(n, 2) * 200).astype(np.float32)),
        "category": jnp.zeros(n, jnp.int32),
    }
    pose = jnp.eye(4)
    K = jnp.asarray([[200.0, 0, 128], [0, 200, 96], [0, 0, 1]])
    hw = jnp.asarray([192.0, 256.0])

    @partial(jax.jit, static_argnames=("cfg",))
    def prep(state, det, pose, K, hw, cfg):
        G = state.capacity
        mask = ds._filter_mask(det, hw, cfg)
        state, _ = ds._append_detections(state, det, mask, pose, K, hw, jnp.int32(0))
        slot = jnp.arange(G)
        mask_all = slot < state.n
        corners_all = box_corners(state.xyzlhw, state.R)
        rows = ds._gated_iou_rows(corners_all, mask_all, corners_all, mask_all, cfg)
        iou = rows * (1.0 - jnp.eye(G))
        return dataclasses.replace(state, iou=iou)

    return prep(state, det, pose, K, hw, cfg)


# variant A: outer loop only (suppression masks, no inner record loop)
@partial(jax.jit, static_argnames=("cfg",))
def nms_outer_only(state, cfg):
    G = state.capacity
    slot_valid = jnp.arange(G) < state.n

    def outer_cond(c):
        _, remaining, *_ = c
        return jnp.any(remaining)

    def outer_body(c):
        state, remaining, keep, success = c
        i = ds._argmax_score_desc(state.scores, remaining)
        keep = keep.at[i].set(True)
        remaining = remaining.at[i].set(False)
        ious = state.iou[i] * remaining
        supp = remaining & (ious > cfg.nms_threshold)
        remaining = remaining & ~supp
        any_supp = jnp.any(supp)
        valid_num = state.valid_num.at[i].add(jnp.where(any_supp, 1.0, 0.0))
        success = success.at[i].set(success[i] | any_supp)
        state = dataclasses.replace(state, valid_num=valid_num)
        return state, remaining, keep, success

    state, _, keep, success = jax.lax.while_loop(
        outer_cond, outer_body,
        (state, slot_valid, jnp.zeros(G, bool), jnp.zeros(G, bool)))
    return state, keep, success


# variant B: nested loops, inner body = trivial keep update (no _record_one)
@partial(jax.jit, static_argnames=("cfg",))
def nms_nested_trivial(state, cfg):
    G = state.capacity
    slot_valid = jnp.arange(G) < state.n

    def outer_cond(c):
        _, remaining, *_ = c
        return jnp.any(remaining)

    def outer_body(c):
        state, remaining, keep, success = c
        i = ds._argmax_score_desc(state.scores, remaining)
        keep = keep.at[i].set(True)
        remaining = remaining.at[i].set(False)
        ious = state.iou[i] * remaining
        supp = remaining & (ious > cfg.nms_threshold)
        remaining = remaining & ~supp

        def inner_cond(ic):
            supp_mask, *_ = ic
            return jnp.any(supp_mask)

        def inner_body(ic):
            supp_mask, state, keep = ic
            j = ds._argmax_score_desc(state.scores, supp_mask)
            supp_mask = supp_mask.at[j].set(False)
            keep = keep.at[j].set(False)
            return supp_mask, state, keep

        _, state, keep = jax.lax.while_loop(inner_cond, inner_body, (supp, state, keep))
        return state, remaining, keep, success

    state, _, keep, success = jax.lax.while_loop(
        outer_cond, outer_body,
        (state, slot_valid, jnp.zeros(G, bool), jnp.zeros(G, bool)))
    return state, keep, success


put_ms("nothing")

state = fresh_state_with_iou(0)
s2, keep, succ = nms_outer_only(state, cfg)
jax.block_until_ready(s2.n)
put_ms("outer-only NMS")

state = fresh_state_with_iou(1)
s2, keep, succ = nms_nested_trivial(state, cfg)
jax.block_until_ready(s2.n)
put_ms("nested trivial-inner NMS")

state = fresh_state_with_iou(2)
s2, keep, succ = jax.jit(ds._nms_greedy, static_argnames=("cfg",))(state, cfg)
jax.block_until_ready(s2.n)
put_ms("full _nms_greedy")

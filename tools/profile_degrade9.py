"""Bisect WHICH phase of keyframe_step poisons the tunnel: run truncated
versions of the step (filters+append / +iou / +nms / +corr / +compact)."""
import dataclasses
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

sys.stdout = open("/tmp/probe9_out.txt", "w", buffering=1)

from functools import partial

from boxfusion_tpu.geometry.boxes import box_corners
from boxfusion_tpu.geometry.projection import project_boxes_to_2d
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


def inputs(seed=0, n=100):
    rng = np.random.RandomState(seed)
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
    return det, pose, K, hw


@partial(jax.jit, static_argnames=("cfg", "upto"))
def truncated(state, det, pose, K, hw, cfg, upto):
    G = state.capacity
    mask = ds._filter_mask(det, hw, cfg)
    n_before = state.n
    state, k_new = ds._append_detections(state, det, mask, pose, K, hw, jnp.int32(0))
    if upto == "append":
        return state
    slot = jnp.arange(G)
    mask_all = slot < state.n
    is_new = (slot >= n_before) & mask_all
    corners_all = box_corners(state.xyzlhw, state.R)
    rows = ds._gated_iou_rows(corners_all, is_new, corners_all, mask_all, cfg)
    iou = jnp.where(is_new[:, None], rows, state.iou)
    iou = iou * (1.0 - jnp.eye(G))
    state = dataclasses.replace(state, iou=iou)
    if upto == "iou":
        return state
    state, keep, success = ds._nms_greedy(state, cfg)
    if upto == "nms":
        return state
    proj2d = project_boxes_to_2d(corners_all, K, pose, hw[0], hw[1])
    state, keep = ds._correspondence(state, keep, success, n_before, proj2d, cfg)
    if upto == "corr":
        return state
    state = ds._compact(state, keep)
    return state


put_ms("nothing")
for phase in ("append", "iou", "nms", "corr", "compact"):
    state = init_state(capacity=512, max_views=10, obs_capacity=4096)
    det, pose, K, hw = inputs(0)
    state = truncated(state, det, pose, K, hw, cfg, phase)
    jax.block_until_ready(state.n)
    det, pose, K, hw = inputs(1)
    state = truncated(state, det, pose, K, hw, cfg, phase)
    jax.block_until_ready(state.n)
    put_ms(f"phase<={phase}")

"""Device-resident world state for the online pipeline.

The SURVEY.md section 7 design stance realized: the entire keyframe update
-- filters -> association -> manager bookkeeping -> PST fusion -- runs as
one jitted function over ``(DeviceState, detections) -> DeviceState`` with
no host round trips (the reference crosses host<->device dozens of times
per keyframe, SURVEY.md section 3.1; on remote-attached TPUs every crossing
costs ~30ms RTT).

All state is fixed-capacity and slot-packed: valid world slots are
``[0, n)``; fusion lists are ``(G, V)`` int32 padded with ``PAD_ID`` so the
reference's "sorted list" semantics become plain array sorts; the
observation store is an append-only ``(M, ...)`` bank indexed by init_id
(the reference's ever-growing ``per_frame_ins``, demo.py:254).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

PAD_ID = np.int32(2**30)  # fusion-list padding (sorts after any real id)
STATS_WIDTH = 8  # len of DeviceState.stats (see the field's counter list)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DeviceState:
    """Fixed-capacity world + manager + observation state (all on device)."""

    # world set (slots [0, n) valid)
    xyzlhw: jnp.ndarray      # (G, 6)
    R: jnp.ndarray           # (G, 3, 3)
    scores: jnp.ndarray      # (G,)
    category: jnp.ndarray    # (G,) int32
    pred_boxes: jnp.ndarray  # (G, 4) xyxy
    init_id: jnp.ndarray     # (G,) int32 -> observation index
    frame_id: jnp.ndarray    # (G,) int32
    valid_num: jnp.ndarray   # (G,) float32
    n: jnp.ndarray           # () int32
    iou: jnp.ndarray         # (G, G) cached pairwise OBB IoU

    # fusion manager (box_manager.py:13-17 equivalents)
    flist: jnp.ndarray       # (G, V) int32, PAD_ID padded, ascending
    fcount: jnp.ndarray      # (G,) int32
    fflag: jnp.ndarray       # (G,) bool
    already: jnp.ndarray     # (G, V) last fused member list per slot
    already_valid: jnp.ndarray  # (G,) bool

    # observation store (append-only)
    obs_pose: jnp.ndarray    # (M, 4, 4)
    obs_xyzlhw: jnp.ndarray  # (M, 6)
    obs_R: jnp.ndarray       # (M, 3, 3)
    obs_score: jnp.ndarray   # (M,)
    obs_corners2d: jnp.ndarray  # (M, 8, 2)
    obs_n: jnp.ndarray       # () int32

    # no-silent-caps counters (cumulative over the sequence):
    # [0] detections dropped because the world set was full,
    # [1] detections dropped because the observation bank was full,
    # [2] containment-gated IoU pairs truncated by max_gated_pairs,
    # [3] keyframes processed,
    # [4] detections past the CLIP label budget (fused path; left unboosted
    #     with the background label -- see models/clip/head.py),
    # [5] fusion-list members dropped past max_views,
    # [6] eligible fusion slots deferred past max_fusions,
    # [7] unrolled-NMS sweep/record budget exhaustions (StepConfig.
    #     max_nms_sweeps / max_nms_records -- device_step.py).
    stats: jnp.ndarray       # (STATS_WIDTH,) int32

    def tree_flatten(self):
        fields = dataclasses.fields(self)
        return tuple(getattr(self, f.name) for f in fields), None

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)

    @property
    def capacity(self) -> int:
        return self.xyzlhw.shape[0]

    @property
    def max_views(self) -> int:
        return self.flist.shape[1]


def init_state(capacity: int = 512, max_views: int = 10, obs_capacity: int = 4096) -> DeviceState:
    G, V, M = capacity, max_views, obs_capacity
    f32 = jnp.float32
    return DeviceState(
        xyzlhw=jnp.zeros((G, 6), f32).at[:, 3:].set(1.0),
        R=jnp.tile(jnp.eye(3, dtype=f32)[None], (G, 1, 1)),
        scores=jnp.zeros((G,), f32),
        category=jnp.zeros((G,), jnp.int32),
        pred_boxes=jnp.zeros((G, 4), f32),
        init_id=jnp.zeros((G,), jnp.int32),
        frame_id=jnp.zeros((G,), jnp.int32),
        valid_num=jnp.zeros((G,), f32),
        n=jnp.int32(0),
        iou=jnp.zeros((G, G), f32),
        flist=jnp.full((G, V), PAD_ID, jnp.int32),
        fcount=jnp.zeros((G,), jnp.int32),
        fflag=jnp.zeros((G,), bool),
        already=jnp.full((G, V), PAD_ID, jnp.int32),
        already_valid=jnp.zeros((G,), bool),
        obs_pose=jnp.tile(jnp.eye(4, dtype=f32)[None], (M, 1, 1)),
        obs_xyzlhw=jnp.zeros((M, 6), f32).at[:, 3:].set(1.0),
        obs_R=jnp.tile(jnp.eye(3, dtype=f32)[None], (M, 1, 1)),
        obs_score=jnp.zeros((M,), f32),
        obs_corners2d=jnp.zeros((M, 8, 2), f32),
        obs_n=jnp.int32(0),
        stats=jnp.zeros((STATS_WIDTH,), jnp.int32),
    )


def export_world(state: DeviceState, class_list=None) -> Dict[str, np.ndarray]:
    """Pull the packed world set to host numpy (end-of-sequence sync)."""
    n = int(state.n)
    out = {
        "xyzlhw": np.asarray(state.xyzlhw[:n]),
        "R": np.asarray(state.R[:n]),
        "scores": np.asarray(state.scores[:n]),
        "category": np.asarray(state.category[:n]),
        "pred_boxes": np.asarray(state.pred_boxes[:n]),
        "init_id": np.asarray(state.init_id[:n]),
        "frame_id": np.asarray(state.frame_id[:n]),
        "valid_num": np.asarray(state.valid_num[:n]),
        "fusion_flag": np.asarray(state.fflag[:n]),
        "fusion_list": [
            [int(x) for x in row if x != PAD_ID]
            for row in np.asarray(state.flist[:n])
        ],
        "stats": {
            "dropped_world_capacity": int(state.stats[0]),
            "dropped_obs_capacity": int(state.stats[1]),
            "truncated_gated_pairs": int(state.stats[2]),
            "keyframes": int(state.stats[3]),
            "label_overflow": int(state.stats[4]),
            # fusion-list merges dropping members past max_views (the
            # reference's Python lists are unbounded there)
            "truncated_fusion_members": int(state.stats[5]),
            # eligible fusion slots pushed past max_fusions, counted once
            # per (keyframe, slot) OCCURRENCE -- a slot deferred across k
            # keyframes adds k, so this is deferral pressure, not a count
            # of distinct skipped objects
            "deferred_fusions": int(state.stats[6]),
            # unrolled-engine NMS compile budgets hit (unconfirmed Jacobi
            # fixed point or unreplayed suppression records -- raise
            # StepConfig.max_nms_sweeps / max_nms_records if ever nonzero)
            "nms_budget_exhausted": int(state.stats[7]),
        },
    }
    if class_list is not None:
        out["categories"] = [class_list[int(c)] for c in out["category"]]
    return out

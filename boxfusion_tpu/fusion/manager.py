"""Box manager: fusion-list bookkeeping and greedy association decisions.

Capability target: ``BoxManager`` (reference boxfusion/box_manager.py:9-245)
plus the greedy 3D NMS driver (reference instances.py:22-101) and the
small-object 2D correspondence pass (instances.py:411-490).

Division of labor (TPU-first): all *dense math* -- pairwise OBB IoU, box
corner projection, 2D IoU -- is computed on device in fused batches (see
``boxfusion_tpu.fusion.association``); this module consumes those matrices
and runs the *sequential decision logic* (greedy suppression order, fusion
list growth, keep-index surgery) in numpy.  The decisions are inherently
order-dependent scalar logic over at most a few hundred items per keyframe
(microseconds on host), while the reference spent its time inside scipy
ConvexHull + 25^3 grids *inside* this loop -- that part is what moved to the
TPU.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


class BoxManager:
    """Fusion bookkeeping (box_manager.py:9-245), numpy edition."""

    def __init__(self, cfg):
        self.fusion_list: List[List[int]] = []
        self.fusion_flag: List[int] = []
        self.already_fusion: List[List[int]] = []
        self.num_record: Dict[int, int] = {}
        self.cfg = cfg
        self.rotation_gap = float(cfg["association"]["rotation_gap"])
        self.translation_gap = float(cfg["association"]["translation_gap"])
        self.small_size = float(cfg["box_fusion"]["small_size"])

    # -- lifecycle ----------------------------------------------------------
    def init_new_predictions(self, box_num: int, all_num: int) -> None:
        for i in range(box_num):
            self.fusion_list.append([i + all_num])
            self.fusion_flag.append(0)

    def add_fusion_ind(self, idx_list: Sequence[int]) -> None:
        self.already_fusion.append(list(idx_list))

    def check_if_fusion(self, idx_list: Sequence[int]) -> bool:
        return list(idx_list) in self.already_fusion

    def update(self, keep_idx) -> None:
        # The reference reindexes only fusion_list here (box_manager.py:
        # 131-133), leaving fusion_flag addressed by STALE indices after any
        # removal; both engines here compact the flag with the world set
        # (device: _compact's fflag gather) -- a documented deviation.
        self.fusion_list = [self.fusion_list[int(i)] for i in keep_idx]
        self.fusion_flag = [self.fusion_flag[int(i)] for i in keep_idx]

    def update_fusion_flag(self, idx: int) -> None:
        self.fusion_flag[idx] = 1

    # -- pose / center disparity (box_manager.py:168-215) --------------------
    @staticmethod
    def compute_pose_disparity(pose1: np.ndarray, pose2: np.ndarray):
        t1, t2 = pose1[:3, 3], pose2[:3, 3]
        baseline = float(np.linalg.norm(t2 - t1))
        r_rel = pose2[:3, :3] @ pose1[:3, :3].T
        trace = np.clip((np.trace(r_rel) - 1) / 2, -1.0, 1.0)
        angle = float(np.arccos(trace) * 180.0 / np.pi)
        return baseline, angle, 0.6 * baseline + 0.4 * angle

    def _pose_differs(self, pose1, pose2) -> bool:
        b, r, _ = self.compute_pose_disparity(pose1, pose2)
        return b > self.translation_gap or r > self.rotation_gap

    # -- record (box_manager.py:40-129) --------------------------------------
    def record(self, cur_id, fusion_inds, init_id, cam_poses, box_size, keep, box_centers):
        """NMS-time fusion-list growth; may swap `keep` membership.

        Args:
          cur_id: surviving index into the global set.
          fusion_inds: suppressed global indices.
          init_id: (N,) observation ids per global index.
          cam_poses: (M, 4, 4) per-observation camera poses (obs store).
          box_size: (N, 3) dims of the global set.
          keep: python list of currently kept indices (mutated copy returned).
          box_centers: (N, 3) centers.
        """
        for idx in fusion_inds:
            if len(self.fusion_list[idx]) == 1:
                # a brand-new observation got suppressed into cur_id
                count = 0
                for i in self.fusion_list[cur_id]:
                    b, r, _ = self.compute_pose_disparity(
                        cam_poses[i], cam_poses[init_id[idx]]
                    )
                    center_dis = float(
                        np.linalg.norm(box_centers[cur_id] - box_centers[idx])
                    )
                    if (b > self.translation_gap or r > self.rotation_gap) or center_dis > 0.5:
                        count += 1
                if count == len(self.fusion_list[cur_id]) and len(self.fusion_list[cur_id]) < 5:
                    self.fusion_list[cur_id] += [int(init_id[idx])]
                    self.fusion_list[cur_id].sort()
            else:
                # a multi-view old box got suppressed by cur_id
                count = 0
                for i in self.fusion_list[idx]:
                    b, r, _ = self.compute_pose_disparity(
                        cam_poses[i], cam_poses[init_id[cur_id]]
                    )
                    center_dis = float(
                        np.linalg.norm(box_centers[cur_id] - box_centers[idx])
                    )
                    if (b > self.translation_gap or r > self.rotation_gap) or center_dis > 0.5:
                        count += 1
                if count == len(self.fusion_list[idx]) and len(self.fusion_list[idx]) < 5:
                    self.fusion_list[cur_id] += self.fusion_list[idx]
                    self.fusion_list[cur_id].sort()
                else:
                    # the old multi-view box should win over the new one
                    if cur_id in keep:
                        keep.remove(cur_id)
                        keep.append(idx)
                if self.fusion_flag[idx] == 1:
                    self.fusion_flag[cur_id] = 1
        return keep

    def record_corr(self, cur_id, fusion_inds, init_id, cam_poses, keep):
        """Correspondence-pass variant (box_manager.py:90-129): pose-only gate."""
        keep = np.asarray(keep)
        for idx in fusion_inds:
            if len(self.fusion_list[idx]) == 1:
                count = sum(
                    1
                    for i in self.fusion_list[cur_id]
                    if self._pose_differs(cam_poses[i], cam_poses[init_id[idx]])
                )
                if count == len(self.fusion_list[cur_id]) and len(self.fusion_list[cur_id]) < 5:
                    self.fusion_list[cur_id] += [int(init_id[idx])]
                    self.fusion_list[cur_id].sort()
            else:
                count = sum(
                    1
                    for i in self.fusion_list[idx]
                    if self._pose_differs(cam_poses[i], cam_poses[init_id[cur_id]])
                )
                if count == len(self.fusion_list[idx]) and len(self.fusion_list[idx]) < 5:
                    self.fusion_list[cur_id] += self.fusion_list[idx]
                    self.fusion_list[cur_id].sort()
                else:
                    keep[keep == cur_id] = idx
                if self.fusion_flag[idx] == 1:
                    self.fusion_flag[cur_id] = 1
        return keep

    # -- validity check (box_manager.py:151-166) ------------------------------
    def check_valid_num(self, frame_ids: np.ndarray, valid_num: np.ndarray, count: int, gap: int):
        """Indices to keep: boxes re-observed, or too recent to judge."""
        zero = (valid_num == 0) & (frame_ids < (count - gap))
        keep = np.arange(len(frame_ids))[~zero]
        self.fusion_list = [self.fusion_list[int(i)] for i in keep]
        self.fusion_flag = [self.fusion_flag[int(i)] for i in keep]
        return keep

    # -- detection-stage filters (box_manager.py:217-245) ---------------------
    @staticmethod
    def check_uv_bounds(uv: np.ndarray, W: int, H: int, ratio: float = 1.0) -> np.ndarray:
        gap_w = int((1 - ratio) * W)
        gap_h = int((1 - ratio) * H)
        u, v = uv[:, 0], uv[:, 1]
        return (u > gap_w) & (u < (W - gap_w)) & (v > gap_h) & (v < (H - gap_h))

    @staticmethod
    def check_floor_mask(box_3d: np.ndarray, ratio: float = 20.0) -> np.ndarray:
        size = box_3d[:, 3:]
        mx = size.max(axis=1)
        mn = size.min(axis=1)
        second = np.sort(size, axis=1)[:, 1]
        mask = mx / mn > ratio
        second_mask = (
            (mx / mn > ratio / 2)
            & (mx / second > ratio / 2)
            & (second / mn < 2.0)
            & (second < 0.15)
            & (mn < 0.15)
        )
        return mask | second_mask

    @staticmethod
    def check_large_mask(box_3d: np.ndarray, thres: float = 0.5) -> np.ndarray:
        return box_3d[:, 3:].max(axis=1) > thres


def nms_3d(
    valid_num: np.ndarray,
    box_manager: BoxManager,
    iou_matrix: np.ndarray,
    scores: np.ndarray,
    init_id: np.ndarray,
    cam_poses: np.ndarray,
    box_size: np.ndarray,
    box_centers: np.ndarray,
    iou_threshold: float = 0.5,
):
    """Greedy score-ordered 3D NMS (instances.py:22-101).

    Identical decision sequence to the reference, but consuming a
    *precomputed* pairwise IoU matrix (device-computed) instead of running
    ConvexHull + grid sampling per pair inside the loop.

    Args:
      valid_num: (N,) re-observation counters, incremented in place.
      iou_matrix: (N, N) OBB IoUs of the current global set.
      scores / init_id / box_size / box_centers: (N, ...) global-set fields.
      cam_poses: (M, 4, 4) observation-store poses indexed by init_id.

    Returns:
      (keep, success_nms) sorted index arrays.
    """
    # kind="stable": numpy's default argsort is unstable quicksort, so tied
    # scores would be engine-dependent; a reversed STABLE ascending sort
    # gives the deterministic larger-index-first tie order the device
    # engines implement (device_step.py::_argmax_score_desc)
    order = np.asarray(scores).argsort(kind="stable")[::-1]
    keep: List[int] = []
    success_nms: List[int] = []

    while order.size > 0:
        i = int(order[0])
        keep.append(i)
        temp_order = order[1:]
        ious = iou_matrix[i, temp_order]

        inds = np.where(ious <= iou_threshold)[0]
        nms_inds = np.where(ious > iou_threshold)[0]
        if nms_inds.shape[0] >= 1:
            valid_num[i] += 1
            success_nms.append(i)
            nms_box_inds = [int(j) for j in temp_order[nms_inds]]
            keep = box_manager.record(
                i, nms_box_inds, init_id, cam_poses, box_size, keep, box_centers
            )

        order = order[inds + 1]
        if order.size == 1:
            keep.append(int(order[0]))
            break

    keep.sort()
    success_nms.sort()
    return np.array(keep, dtype=np.int64), np.array(success_nms, dtype=np.int64)


def correspondence_association(
    cfg,
    box_manager: BoxManager,
    cur_keep_idx,
    cur_success_nms,
    keep_idx: np.ndarray,
    n_global: int,
    new_dims: np.ndarray,
    new_boxes2d: np.ndarray,
    new_scores: np.ndarray,
    global_scores: np.ndarray,
    global_dims: np.ndarray,
    projected_global_2d: np.ndarray,
    valid_num: np.ndarray,
    init_id: np.ndarray,
    obs_cam_poses: np.ndarray,
    threshold: float = 0.33,
):
    """Small-object 2D correspondence pass (instances.py:411-490).

    ``projected_global_2d`` is the device-computed (G, 4) xyxy projection of
    the global boxes at ``global_keep_idx = keep_idx[keep_idx < n_global]``
    into the current keyframe.  Note the reference computes global_keep_idx
    *once* (instances.py:424) and keeps using it even after removals inside
    the loop -- replicated here.

    Returns the updated keep_idx (sorted).
    """
    keep_idx = np.array(keep_idx)
    global_keep_idx = keep_idx[keep_idx < n_global]
    small_size = float(cfg["box_fusion"]["small_size"])

    small_idx = [
        idx
        for idx in cur_keep_idx
        if np.max(new_dims[idx, :3]) <= small_size and idx not in cur_success_nms
    ]
    if not small_idx or len(global_keep_idx) == 0:
        return np.sort(keep_idx)

    boxes_2d = projected_global_2d
    assert boxes_2d.shape[0] == len(global_keep_idx)
    small_mask = np.max(global_dims[global_keep_idx], axis=1) < small_size + 0.1

    for idx in small_idx:
        iou = _iou_2d_one_vs_many(new_boxes2d[idx], boxes_2d) * small_mask
        best = int(np.argmax(iou))
        if iou[best] > threshold:
            corr = int(global_keep_idx[best])
            if global_scores[corr] < new_scores[idx]:
                keep_idx = keep_idx[keep_idx != corr]
                valid_num[idx + n_global] += 1
                keep_idx = box_manager.record_corr(
                    idx + n_global, [corr], init_id, obs_cam_poses, keep_idx
                )
            else:
                keep_idx = keep_idx[keep_idx != (idx + n_global)]
                valid_num[corr] += 1
                keep_idx = box_manager.record_corr(
                    corr, [idx + n_global], init_id, obs_cam_poses, keep_idx
                )

    return np.sort(keep_idx)


def _iou_2d_one_vs_many(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """xyxy IoU (instances.py:643-668)."""
    a = a.astype(np.float64)
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    x1 = np.maximum(a[0], b[:, 0])
    y1 = np.maximum(a[1], b[:, 1])
    x2 = np.minimum(a[2], b[:, 2])
    y2 = np.minimum(a[3], b[:, 3])
    inter = np.maximum(0, x2 - x1) * np.maximum(0, y2 - y1)
    return inter / (area_a + area_b - inter + 1e-6)

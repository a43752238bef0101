"""Deterministic synthetic posed RGB-D sequences + oracle detector.

The reference has no tests (SURVEY.md section 4); its de-facto test is a
visual end-to-end run.  This module provides what the reference lacks: a
closed-form scene -- known world boxes, known camera ring -- so the full
online pipeline (association -> manager -> fusion) can be integration-tested
and benchmarked deterministically, with or without the real CuTR weights.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from boxfusion_tpu.data.readers import Frame


def _look_at_pose(eye: np.ndarray, target: np.ndarray) -> np.ndarray:
    """UPRIGHT camera-to-world pose (y down, z forward) in a z-up world."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    down = np.array([0.0, 0.0, -1.0])
    right = np.cross(down, fwd)
    n = np.linalg.norm(right)
    if n < 1e-6:
        right = np.array([1.0, 0.0, 0.0])
    else:
        right = right / n
    down_o = np.cross(fwd, right)
    P = np.eye(4, dtype=np.float32)
    P[:3, :3] = np.stack([right, down_o, fwd], axis=1)
    P[:3, 3] = eye
    return P


@dataclasses.dataclass
class SyntheticSequence:
    """A ring of cameras orbiting a room of boxes.

    Attributes:
      gt_xyzlhw: (G, 6) world boxes (z-up world, gravity-aligned R about z).
      gt_R: (G, 3, 3).
    """

    n_frames: int = 60
    n_boxes: int = 6
    image_hw: tuple = (192, 256)
    seed: int = 0
    video_id: str = "synthetic"

    def __post_init__(self):
        rng = np.random.RandomState(self.seed)
        g = self.n_boxes
        centers = np.stack(
            [
                rng.uniform(-1.5, 1.5, g),
                rng.uniform(-1.5, 1.5, g),
                rng.uniform(0.2, 1.2, g),
            ],
            axis=1,
        )
        dims = rng.uniform(0.2, 0.7, (g, 3))
        yaws = rng.uniform(-np.pi, np.pi, g)
        c, s = np.cos(yaws), np.sin(yaws)
        zero, one = np.zeros(g), np.ones(g)
        R = np.stack(
            [c, -s, zero, s, c, zero, zero, zero, one], axis=-1
        ).reshape(g, 3, 3)
        self.gt_xyzlhw = np.concatenate([centers, dims], axis=1).astype(np.float32)
        self.gt_R = R.astype(np.float32)

        h, w = self.image_hw
        f = 0.9 * max(h, w)
        self.K = np.array(
            [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float32
        )

        self.poses = []
        for i in range(self.n_frames):
            ang = 2 * np.pi * i / self.n_frames
            eye = np.array([3.5 * np.cos(ang), 3.5 * np.sin(ang), 1.4])
            self.poses.append(_look_at_pose(eye, np.array([0.0, 0.0, 0.7])))

    def __len__(self):
        return self.n_frames

    def __iter__(self):
        h, w = self.image_hw
        rng = np.random.RandomState(self.seed + 1)
        for i in range(self.n_frames):
            image = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            depth = np.full((h, w), 2.5, np.float32) + rng.uniform(-0.2, 0.2, (h, w)).astype(
                np.float32
            )
            yield Frame(
                image=image,
                depth=depth,
                K=self.K,
                K_depth=self.K,
                T_gravity=np.eye(3, dtype=np.float32),
                gt_pose=self.poses[i],
                video_id=self.video_id,
                timestamp=i,
            )


class OracleDetector:
    """A drop-in detector that 'detects' the synthetic GT boxes.

    Produces the same output dict as the CuTR detector wrapper (camera-frame
    boxes), with optional noise, so the association/fusion stack can be
    exercised end-to-end with known expected outcomes.
    """

    def __init__(self, seq: SyntheticSequence, noise: float = 0.0, score: float = 0.9,
                 desc_dim: int = 256, seed: int = 0):
        self.seq = seq
        self.noise = noise
        self.score = score
        self.desc_dim = desc_dim
        self.rng = np.random.RandomState(seed)

    def __call__(self, frame: Frame) -> dict:
        P = frame.gt_pose
        Rp, t = P[:3, :3], P[:3, 3]
        centers_cam = (self.seq.gt_xyzlhw[:, :3] - t) @ Rp  # R^T (c - t)
        R_cam = np.einsum("ji,gjk->gik", Rp, self.seq.gt_R)

        K = frame.K
        h, w = frame.image.shape[:2]
        z = centers_cam[:, 2]
        u = K[0, 0] * centers_cam[:, 0] / np.maximum(z, 1e-6) + K[0, 2]
        v = K[1, 1] * centers_cam[:, 1] / np.maximum(z, 1e-6) + K[1, 2]
        visible = (z > 0.3) & (z < 8.0) & (u > 0) & (u < w) & (v > 0) & (v < h)

        idx = np.where(visible)[0]
        n = len(idx)
        dims = self.seq.gt_xyzlhw[idx, 3:]
        centers = centers_cam[idx]
        if self.noise > 0:
            centers = centers + self.rng.normal(0, self.noise, centers.shape)
            dims = np.maximum(dims + self.rng.normal(0, self.noise, dims.shape), 0.05)

        # tight 2D boxes from projected corners (pure numpy: the oracle must
        # not enqueue device work -- it stands in for a host data source)
        from boxfusion_tpu.geometry.boxes import CORNER_SIGNS

        half = dims * 0.5
        local = CORNER_SIGNS[None] * half[:, None, :]
        corners = np.einsum("nij,nkj->nki", R_cam[idx], local) + centers[:, None, :]
        cu = K[0, 0] * corners[..., 0] / np.maximum(corners[..., 2], 1e-6) + K[0, 2]
        cv = K[1, 1] * corners[..., 1] / np.maximum(corners[..., 2], 1e-6) + K[1, 2]
        cu = np.clip(cu, 0, w)
        cv = np.clip(cv, 0, h)
        boxes2d = np.stack([cu.min(1), cv.min(1), cu.max(1), cv.max(1)], axis=1)

        # tie-free scores (the reference's NMS order uses an unstable sort,
        # so equal scores would make greedy decisions ill-defined); the
        # deterministic pseudo-random tie-break lets new detections sometimes
        # out-score old ones, exercising the keep-swap and fusion paths.
        jitter = ((frame.timestamp * 31 + np.arange(n) * 17) % 97) / 97.0
        scores = (
            np.full(n, self.score, np.float32) - 0.001 * np.arange(n) - 1e-3 * jitter
        )
        return dict(
            scores=scores.astype(np.float32),
            pred_classes=np.zeros(n, np.int64),
            pred_boxes=boxes2d.astype(np.float32),
            pred_logits=np.zeros((n, 2), np.float32),
            boxes3d=np.concatenate([centers, dims], 1).astype(np.float32),
            R=R_cam[idx].astype(np.float32),
            proj_xy=np.stack([u[idx], v[idx]], 1).astype(np.float32),
            object_desc=np.zeros((n, self.desc_dim), np.float32),
        )

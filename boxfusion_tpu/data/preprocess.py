"""Frame preprocessing: pixel normalization, depth whitening, square padding.

Capability target: ``Augmentor`` / ``Preprocessor`` (reference
boxfusion/preprocessor.py:39-217) and ``ImageList.from_tensors`` square-pad
bucketing (reference imagelist.py:54-115).

TPU-first inversions:
  * The reference computes the 10%-trimmed depth whitening **on CPU** per
    frame (preprocessor.py:97-129 "Always do this on CPU!"); here it is a
    jitted sort-based kernel that runs on device at fixed (H, W).
  * Instead of a nest of Measurement wrappers, preprocessing emits a
    ``FrameBatch`` of plain arrays ready for the jitted model.
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.models.cutr.model import PIXEL_MEAN, PIXEL_STD, FrameBatch

# Reference bucket list (preprocessor.py:86, imagelist.py:87-97).
SQUARE_PAD_BUCKETS = (256, 384, 512, 640, 768, 896, 1024)


def pick_square_pad(longest_edge: int, buckets=SQUARE_PAD_BUCKETS) -> int:
    """Smallest bucket >= longest edge (preprocessor.py:178-183)."""
    for b in buckets:
        if b >= longest_edge:
            return int(b)
    raise ValueError(f"image long side {longest_edge} exceeds buckets {buckets}")


@jax.jit
def standardize_depth(depth: jnp.ndarray, trunc_value: float = 0.1):
    """Per-frame trimmed-whitening of a depth map (preprocessor.py:97-129).

    Invalid (<= 0) pixels become NaN, the valid values are sorted, the top and
    bottom 10% are trimmed, and the map is standardized by the trimmed
    mean / sqrt(var + 1e-2); NaNs are replaced by the mean (-> 0 after
    standardization).

    Args:
      depth: (H, W) raw metric depth.

    Returns:
      (whitened (H, W), params (2,) = (mean, std)).
    """
    flat = depth.reshape(-1)
    n = flat.shape[0]
    valid = flat > 0.0
    n_valid = jnp.sum(valid)

    # sort with invalids pushed to the end (mirrors NaN-at-end of torch.sort)
    sort_key = jnp.where(valid, flat, jnp.inf)
    s = jnp.sort(sort_key)

    lo = (trunc_value * n_valid).astype(jnp.int32)
    hi = ((1.0 - trunc_value) * n_valid).astype(jnp.int32)
    idx = jnp.arange(n)
    in_trim = (idx >= lo) & (idx < hi)
    count = jnp.maximum(jnp.sum(in_trim), 1)

    vals = jnp.where(in_trim, s, 0.0)
    mean = jnp.sum(vals) / count
    # unbiased variance like torch.var (preprocessor.py:117)
    var = jnp.sum(jnp.where(in_trim, (s - mean) ** 2, 0.0)) / jnp.maximum(count - 1, 1)
    std = jnp.sqrt(var + 1e-2)

    # degenerate guard (preprocessor.py:111-114)
    degenerate = (hi - lo) <= 1
    mean = jnp.where(degenerate, 0.0, mean)
    std = jnp.where(degenerate, 1.0, std)

    filled = jnp.where(depth > 0.0, depth, mean)
    out = (filled - mean) / std
    return out, jnp.stack([mean, std])


# The reference normalizes with `pixel_mean.to(measurement.data)` where
# `data` is still the raw uint8 image (preprocessor.py:142), so the float
# constants get uint8-TRUNCATED before use.  Mirrored here for activation
# parity with the reference inference path.
PIXEL_MEAN_U8 = PIXEL_MEAN.astype(np.uint8).astype(np.float32)
PIXEL_STD_U8 = PIXEL_STD.astype(np.uint8).astype(np.float32)


@partial(jax.jit, static_argnames=("square", "ratio"))
def _package_jit(image_u8, depth, K, T_gravity, square: int, ratio: int):
    h, w = image_u8.shape[0], image_u8.shape[1]
    img = (image_u8.astype(jnp.float32) - jnp.asarray(PIXEL_MEAN_U8)) / jnp.asarray(
        PIXEL_STD_U8
    )
    img = jnp.pad(img, ((0, square - h), (0, square - w), (0, 0)))

    if depth is not None:
        dh, dw = depth.shape
        dsq = square // ratio
        white, params = standardize_depth(depth)
        white = jnp.pad(white, ((0, dsq - dh), (0, dsq - dw)))
        depth_out = white[None, :, :, None]
        params_out = params[None]
    else:
        depth_out = None
        params_out = jnp.zeros((1, 2), jnp.float32)

    return FrameBatch(
        image=img[None],
        depth=depth_out,
        K=K[None],
        image_hw=jnp.asarray([[h, w]], jnp.float32),
        depth_params=params_out,
        T_gravity=T_gravity[None],
    )


def resolve_pad_and_ratio(image, depth, buckets=SQUARE_PAD_BUCKETS):
    """(square_pad, rgb:depth ratio) for one frame -- the reference's bucket
    rule (imagelist.py:87-97) + ratio constraint (preprocessor.py:163-166).

    Shared by the host Preprocessor and the detector's fused path so the
    bucketing rule has exactly one definition."""
    h, w = image.shape[:2]
    square = pick_square_pad(max(h, w), buckets)
    if depth is not None:
        ratio = round(w / depth.shape[1])
        if ratio not in (1, 2, 4):
            raise ValueError(f"Unsupported rgb -> depth ratio: {ratio}")
    else:
        ratio = 1
    return square, ratio


class Preprocessor:
    """Host-facing preprocessor: numpy frame dict -> device FrameBatch.

    Mirrors the reference's normalize+batch pipeline (preprocessor.py:131-217)
    with the {256..1024} square-pad buckets and the rgb:depth ratio rule
    (must be in {1, 2, 4}, preprocessor.py:163-166).
    """

    def __init__(self, buckets=SQUARE_PAD_BUCKETS):
        self.buckets = buckets

    def __call__(
        self,
        image: np.ndarray,
        depth: Optional[np.ndarray],
        K: np.ndarray,
        T_gravity: np.ndarray,
    ) -> Tuple[FrameBatch, int, int]:
        """Args: image (H, W, 3) uint8 (oriented); depth (Hd, Wd) metric;
        K (3, 3) at image resolution; T_gravity (3, 3).

        Returns (FrameBatch, square, ratio)."""
        square, ratio = resolve_pad_and_ratio(image, depth, self.buckets)
        batch = _package_jit(
            jnp.asarray(image),
            jnp.asarray(depth, jnp.float32) if depth is not None else None,
            jnp.asarray(K, jnp.float32),
            jnp.asarray(T_gravity, jnp.float32),
            square,
            ratio,
        )
        return batch, square, ratio

"""Camera-ray positional embedding (reference boxfusion/pos.py:61-186).

The reference generates per-pixel ray directions at *full image resolution*,
zero-pads to the square pad size, then nearest-downsamples to the feature
resolution (pos.py:159-186).  Nearest interpolation with integer stride 16
samples exactly the pixel at index (16*i, 16*j), so we generate rays directly
at those pixels -- an O(F^2) computation instead of O(S^2), with bit-identical
results (padding regions produce zero rays, which stay zero through
normalization and Fourier features, matching F.pad + F.normalize).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def ray_directions_at_features(
    K: jnp.ndarray, image_hw: jnp.ndarray, feat_size: int, stride: int = 16
) -> jnp.ndarray:
    """Unit ray directions sampled at feature-cell origins.

    Args:
      K: (3, 3) intrinsics at actual image resolution.
      image_hw: (2,) actual (H, W) of the (unpadded) image.
      feat_size: F (padded square size / stride).

    Returns:
      (F, F, 3) unit rays; zero where the sample falls in the pad region.
    """
    idx = jnp.arange(feat_size, dtype=jnp.float32) * stride
    # pixel centers: coords + 0.5 (pos.py:72-80)
    px = idx + 0.5
    gx = jnp.broadcast_to(px[None, :], (feat_size, feat_size))
    gy = jnp.broadcast_to(px[:, None], (feat_size, feat_size))

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    rx = (gx - cx) / fx
    ry = (gy - cy) / fy
    rays = jnp.stack([rx, ry, jnp.ones_like(rx)], axis=-1)
    norm = jnp.linalg.norm(rays, axis=-1, keepdims=True)
    rays = rays / jnp.maximum(norm, 1e-12)

    h, w = image_hw[0], image_hw[1]
    valid = (gy[..., None] - 0.5 < h) & (gx[..., None] - 0.5 < w)
    return jnp.where(valid, rays, 0.0)


def fourier_features(x: jnp.ndarray, dim: int, max_freq: float) -> jnp.ndarray:
    """Log-spaced sin Fourier features (pos.py:110-149, use_log=True).

    Args:
      x: (..., D_in) in [-1, 1].
      dim: target channel budget; num_bands = dim // D_in.

    Returns:
      (..., D_in * num_bands).
    """
    d_in = x.shape[-1]
    num_bands = dim // d_in
    scales = 2.0 ** np.linspace(0.0, np.log2(max_freq), num_bands)
    scales = jnp.asarray(scales, dtype=x.dtype)
    xs = x[..., None] * scales * np.pi
    return jnp.sin(xs).reshape(*x.shape[:-1], d_in * num_bands)


class CameraRayEmbedding(nn.Module):
    """Fourier-encoded camera rays -> linear projection (pos.py:152-186)."""

    dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, K: jnp.ndarray, image_hw: jnp.ndarray, feat_size: int):
        """K: (B, 3, 3); image_hw: (B, 2); returns (B, F, F, dim)."""
        r = jax.vmap(lambda k, hw: ray_directions_at_features(k, hw, feat_size))(
            K, image_hw
        )
        # normalize again post-interp (pos.py:176) -- no-op for unit/zero rays.
        # Rays + Fourier features stay f32; only the projection runs in dtype.
        ff = fourier_features(r, dim=self.dim, max_freq=feat_size // 2)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(ff)

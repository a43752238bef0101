"""Shared small layers and box transforms for the CuTR port.

Parity targets: MLP (reference cubify_transformer.py:48-63), box format
helpers (cubify_transformer.py:24-32), DeltaBox2DTransform
(cubify_transformer.py:445-511), torch-convention bicubic resize used for
the ViT absolute position embeddings (vit.py:60-86).
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(x: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1)


class MLP(nn.Module):
    """ReLU MLP matching reference MLP (cubify_transformer.py:48-63).

    ``dtype`` is the compute dtype (params stay float32); callers that decode
    coordinates from the output cast it back to float32 first.
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


def apply_box_deltas(
    deltas: jnp.ndarray,
    boxes_cxcywh: jnp.ndarray,
    clamp_wh,
    wh_ratio_clip: float = 0.016,
) -> jnp.ndarray:
    """DeltaBox2DTransform.apply_deltas (cubify_transformer.py:478-511).

    Args:
      deltas: (..., 4) (dx, dy, dw, dh).
      boxes_cxcywh: (..., 4) source boxes.
      clamp_wh: (W, H) to clamp the output xyxy to (padded image size), or
        None to skip clamping.

    Returns:
      (..., 4) xyxy boxes.
    """
    dxy = deltas[..., :2]
    dwh = deltas[..., 2:]
    pxy = boxes_cxcywh[..., :2]
    pwh = boxes_cxcywh[..., 2:]

    max_ratio = abs(math.log(wh_ratio_clip))
    dwh = jnp.clip(dwh, -max_ratio, max_ratio)

    gxy = pxy + pwh * dxy
    gwh = pwh * jnp.exp(dwh)
    x1y1 = gxy - gwh * 0.5
    x2y2 = gxy + gwh * 0.5
    out = jnp.concatenate([x1y1, x2y2], axis=-1)
    if clamp_wh is not None:
        w, h = clamp_wh
        hi = jnp.stack([w, h, w, h]).astype(out.dtype)
        out = jnp.clip(out, 0.0, hi)
    return out


def torch_bicubic_matrix(in_size: int, out_size: int, a: float = -0.75) -> np.ndarray:
    """Row-stochastic (out, in) matrix reproducing torch bicubic interpolation.

    torch F.interpolate(mode="bicubic", align_corners=False) uses the Keys
    cubic kernel with a=-0.75 and edge-clamped taps; the map is separable and
    static per (in, out) pair, so we bake it into a matrix (exactness matters
    for checkpoint-activation parity of the abs-pos embedding, vit.py:79-84).
    """
    def kernel(t: np.ndarray) -> np.ndarray:
        t = np.abs(t)
        out = np.zeros_like(t)
        m1 = t <= 1
        out[m1] = (a + 2) * t[m1] ** 3 - (a + 3) * t[m1] ** 2 + 1
        m2 = (t > 1) & (t < 2)
        out[m2] = a * t[m2] ** 3 - 5 * a * t[m2] ** 2 + 8 * a * t[m2] - 4 * a
        return out

    M = np.zeros((out_size, in_size), dtype=np.float64)
    scale = in_size / out_size
    for i in range(out_size):
        x = (i + 0.5) * scale - 0.5
        base = int(np.floor(x))
        t = x - base
        taps = np.array([base - 1, base, base + 1, base + 2])
        w = kernel(np.array([t + 1.0, t, 1.0 - t, 2.0 - t]))
        for tap, wt in zip(taps, w):
            M[i, int(np.clip(tap, 0, in_size - 1))] += wt
    return M.astype(np.float32)


def resize_pos_embed(pos: jnp.ndarray, grid: int, out_hw: Sequence[int]) -> jnp.ndarray:
    """(1, grid*grid(+cls), C) -> (1, H, W, C) via torch-convention bicubic.

    Mirrors get_abs_pos (vit.py:60-86); the cls token (if any) must already
    be stripped by the caller.
    """
    h, w = out_hw
    c = pos.shape[-1]
    p = pos.reshape(grid, grid, c)
    if (h, w) != (grid, grid):
        mh = jnp.asarray(torch_bicubic_matrix(grid, h))
        mw = jnp.asarray(torch_bicubic_matrix(grid, w))
        p = jnp.einsum("hi,ijc,wj->hwc", mh, p, mw)
    return p[None]

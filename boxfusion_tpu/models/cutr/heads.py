"""CuTR prediction heads and prompt encoders.

Parity targets (reference cubify_transformer.py):
  * ScalePredictor (391-411): two linear heads on the 2 metric tokens,
    exponentiated -> predicted depth (shift, scale).
  * ClassPredictor (413-434): foreground logits with focal-style bias init.
  * DeltaBox2DPredictor (436-532): 3-layer zero-init MLP producing clipped
    box deltas decoded against the proposal boxes.
  * AbsoluteBox3DPredictor (534-643): projected-center offset, unscaled z,
    log-dims and yaw-only pose; z / dims de-whitened with the depth
    whitening parameters.
  * Box2DPromptEncoderLearned (360-383): discretized xywh embedding lookup.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from boxfusion_tpu.models.cutr.layers import MLP, apply_box_deltas, box_xyxy_to_cxcywh


class ClassPredictor(nn.Module):
    """Foreground logits (cubify_transformer.py:413-434); always returns f32
    so score sigmoids/top-k stay full precision under a bf16 compute dtype."""

    num_classes: int = 2
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob)
        out = nn.Dense(
            self.num_classes,
            bias_init=nn.initializers.constant(bias_value),
            dtype=self.dtype,
            name="linear",
        )(x)
        return out.astype(jnp.float32)


class DeltaBox2DPredictor(nn.Module):
    """MLP deltas + decode (cubify_transformer.py:514-532).

    The MLP runs in ``dtype``; delta decoding (exp + pixel coordinates) is
    float32 so boxes keep sub-pixel resolution.  Returns (deltas,
    new_boxes_cxcywh)."""

    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, proposal_boxes_cxcywh, clamp_wh):
        dim = x.shape[-1]
        deltas = MLP(dim, 4, self.num_layers, dtype=self.dtype, name="mlp")(x)
        deltas = deltas.astype(jnp.float32)
        xyxy = apply_box_deltas(
            deltas, proposal_boxes_cxcywh.astype(jnp.float32), clamp_wh
        )
        return deltas, box_xyxy_to_cxcywh(xyxy)


class ScalePredictor(nn.Module):
    """exp(linear) shift/scale from the two metric tokens
    (cubify_transformer.py:391-411)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x2):
        shift = nn.Dense(1, dtype=self.dtype, name="shift")(x2[..., 0:1, :])
        scale = nn.Dense(1, dtype=self.dtype, name="scale")(x2[..., 1:2, :])
        shift = jnp.exp(shift.astype(jnp.float32))
        scale = jnp.exp(scale.astype(jnp.float32))
        return jnp.concatenate([shift, scale], axis=-1)[..., 0, :]  # (B, 2)


class AbsoluteBox3DPredictor(nn.Module):
    """3D box head (cubify_transformer.py:534-643), pose_type='z'.

    Returns dict(proj_xy, z_unscaled, z_scaled, dims, pose)."""

    num_layers: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, pred_boxes_cxcywh, depth_params, clamp_wh):
        dim = x.shape[-1]
        out = MLP(dim, 2 + 1 + 3 + 1, self.num_layers, dtype=self.dtype, name="mlp")(x)
        out = out.astype(jnp.float32)  # metric 3D math stays full precision
        pred_boxes_cxcywh = pred_boxes_cxcywh.astype(jnp.float32)
        dxy = out[..., 0:2]
        z_unscaled = out[..., 2:3]
        log_dims = out[..., 3:6]
        yaw = out[..., 6]

        # pose_type="z": euler 'YXZ' with only the Y angle set -> R_y(yaw)
        # (cubify_transformer.py:597-600; transforms.py:34-60).
        c, s = jnp.cos(yaw), jnp.sin(yaw)
        zero = jnp.zeros_like(c)
        one = jnp.ones_like(c)
        pose = jnp.stack(
            [c, zero, s, zero, one, zero, -s, zero, c], axis=-1
        ).reshape(*yaw.shape, 3, 3)

        shift = depth_params[..., None, 0:1]
        scale = depth_params[..., None, 1:2]
        z_scaled = scale * z_unscaled + shift
        dims = jnp.exp(jnp.clip(log_dims, max=5.0)) * scale

        proj_xy = pred_boxes_cxcywh[..., :2] + dxy * pred_boxes_cxcywh[..., 2:]
        w, h = clamp_wh
        hi = jnp.stack([w, h]).astype(proj_xy.dtype)
        proj_xy = jnp.clip(proj_xy, 0.0, hi)

        return dict(
            proj_xy=proj_xy,
            z_unscaled=z_unscaled,
            z_scaled=z_scaled,
            dims=dims,
            pose=pose,
        )


class Box2DPromptEncoderLearned(nn.Module):
    """Discretized xywh embedding lookups (cubify_transformer.py:360-383)."""

    embed_dim: int = 256
    max_xywh: int = 1280
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, boxes_cxcywh):
        idx = jnp.clip(boxes_cxcywh, 0.0, self.max_xywh - 1).astype(jnp.int32)
        quarter = self.embed_dim // 4
        embeds = [
            nn.Embed(self.max_xywh, quarter, dtype=self.dtype, name=n)(idx[..., i])
            for i, n in enumerate(["x", "y", "w", "h"])
        ]
        return jnp.concatenate(embeds, axis=-1)

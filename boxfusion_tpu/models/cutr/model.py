"""CubifyTransformer (CuTR) assembly: RGB-D detector in flax.

Capability target: the reference model assembly (reference
cubify_transformer.py:1101-1323) -- Joiner(ViT) backbone, CameraRayEmbedding,
input projection (1x1 conv + GroupNorm32), MetricQueries + EncoderProposals
prompting, the 6-layer PromptDecoder with per-layer predictor stacks, and
the inference postprocess (K^-1 backprojection, T_gravity, per-image top-k).

TPU-first design notes:
  * Everything is static-shaped: the padded square size S (from the
    {256..1024} buckets), the depth/RGB ratio r, and the query counts
    (2 metric + 300 box) are compile-time constants; actual image size,
    intrinsics and whitening parameters are traced scalars.
  * Dynamic Instances3D plumbing of the reference becomes plain dict-of-array
    outputs with a fixed top-k (topk_per_image) per frame.
  * NHWC layouts end to end.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.models.cutr.decoder import DecoderLayer
from boxfusion_tpu.models.cutr.heads import (
    AbsoluteBox3DPredictor,
    Box2DPromptEncoderLearned,
    ClassPredictor,
    DeltaBox2DPredictor,
    ScalePredictor,
)
from boxfusion_tpu.models.cutr.layers import box_cxcywh_to_xyxy
from boxfusion_tpu.models.cutr.pos import CameraRayEmbedding
from boxfusion_tpu.models.cutr.vit import ViT

PIXEL_MEAN = np.array([123.675, 116.28, 103.53], dtype=np.float32)
PIXEL_STD = np.array([58.395, 57.12, 57.375], dtype=np.float32)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class FrameBatch:
    """Model input: one (possibly batched) preprocessed RGB-D frame.

    Replaces the reference's BatchedSensors nest (batching.py:26-90): the
    jitted model consumes plain arrays.

    Attributes:
      image: (B, S, S, 3) float32, pixel-normalized, zero-padded to square.
      depth: (B, S/r, S/r, 1) float32, per-frame whitened, zero-padded.
      K: (B, 3, 3) intrinsics of the oriented image at actual resolution.
      image_hw: (B, 2) float (H, W) actual image size (pre-padding).
      depth_params: (B, 2) whitening (mean, std) used on the depth map.
      T_gravity: (B, 3, 3) gravity-alignment rotation for predicted poses.
    """

    image: jnp.ndarray
    depth: Optional[jnp.ndarray]
    K: jnp.ndarray
    image_hw: jnp.ndarray
    depth_params: jnp.ndarray
    T_gravity: jnp.ndarray

    def tree_flatten(self):
        return (
            (self.image, self.depth, self.K, self.image_hw, self.depth_params, self.T_gravity),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        return cls(*leaves)


@dataclasses.dataclass(frozen=True)
class CuTRConfig:
    embed_dim: int = 768            # ViT width (768 / 384 / 192)
    decoder_dim: int = 256
    depth_model: bool = True
    num_decoder_layers: int = 6
    num_queries: int = 300          # EncoderProposals top_k_test
    num_metric_tokens: int = 2
    topk_per_image: int = 100
    level_strides: Tuple[int, ...] = (16, 32, 64)
    min_proposal_size: float = 50.0
    max_query_embeds: int = 1200
    # Compute dtype for the matmul-heavy paths (backbone, decoder, head
    # MLPs); params, coordinate decoding, softmax and norm statistics stay
    # float32.  bfloat16 is MXU-native on TPU (~2x forward throughput).
    dtype: Any = jnp.float32
    # Backbone attention implementation.  "xla" everywhere: the r5
    # completion-forced A/B shows the whole-sequence Pallas kernel LOSING
    # at CuTR shapes (7.67 vs 5.71 ms @ 512px -- too few sequences to
    # pipeline the grid) while winning on the CLIP tower; see
    # models/cutr/vit.py::JointAttention.  "kernel"/"auto" remain available.
    attn_impl: str = "xla"

    @property
    def vit_heads(self) -> int:
        return {768: 12, 384: 6, 192: 3}[self.embed_dim]


class EncoderProposals(nn.Module):
    """Dense anchor proposals over expanded levels, scored and refined
    (cubify_transformer.py:739-943)."""

    cfg: CuTRConfig

    @nn.compact
    def __call__(self, src_2d: jnp.ndarray, clamp_wh):
        """src_2d: (B, F, F, C) stride-16 projected features.

        Returns (enc_logits, enc_boxes_cxcywh, topk_boxes, topk_logits,
        topk_indices)."""
        cfg = self.cfg
        B, F, _, C = src_2d.shape
        S = F * cfg.level_strides[0]
        dt = cfg.dtype

        # expand_encoder_output (835-862): per-level projections of the
        # stride-16 map.
        mems = [src_2d]
        lvl1 = nn.Conv(C, (2, 2), strides=(2, 2), padding="VALID", dtype=dt, name="enc_output_proj_1")(src_2d)
        mems.append(lvl1)
        l2 = nn.Conv(C, (2, 2), strides=(2, 2), padding="VALID", dtype=dt, name="enc_output_proj_2_0")(src_2d)
        l2 = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="enc_output_proj_2_1")(l2)
        l2 = nn.gelu(l2, approximate=False)
        l2 = nn.Conv(C, (2, 2), strides=(2, 2), padding="VALID", dtype=dt, name="enc_output_proj_2_3")(l2)
        mems.append(l2)

        # anchors (864-916): grid centers * stride, wh = min_size * 2^lvl.
        proposals, valids, flat = [], [], []
        for lvl, mem in enumerate(mems):
            stride = cfg.level_strides[lvl]
            f = mem.shape[1]
            coords = (jnp.arange(f, dtype=jnp.float32) + 0.5) * stride
            gx = jnp.broadcast_to(coords[None, :], (f, f))
            gy = jnp.broadcast_to(coords[:, None], (f, f))
            wh = jnp.full((f, f), cfg.min_proposal_size * (2.0 ** lvl))
            p = jnp.stack([gx, gy, wh, wh], axis=-1).reshape(-1, 4)
            # validity: strictly inside (1%, 99%) of the padded square
            # (the reference's mask is all-valid, so img_size = S).
            valid = jnp.all((p > 0.01 * S) & (p < 0.99 * S), axis=-1)
            proposals.append(jnp.broadcast_to(p[None], (B, p.shape[0], 4)))
            valids.append(jnp.broadcast_to(valid[None], (B, valid.shape[0])))
            flat.append(mem.reshape(B, -1, C))

        memory = jnp.concatenate(flat, axis=1)          # (B, S_tot, C)
        anchors = jnp.concatenate(proposals, axis=1)    # (B, S_tot, 4)
        valid = jnp.concatenate(valids, axis=1)         # (B, S_tot)

        fill = float(S)
        anchors = jnp.where(valid[..., None], anchors, fill)
        memory = jnp.where(valid[..., None], memory, 0.0)
        memory = nn.Dense(C, dtype=dt, name="enc_output")(memory)
        memory = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="enc_output_norm")(memory)

        enc_logits = ClassPredictor(dtype=dt, name="class_predictor")(memory)
        _, enc_boxes = DeltaBox2DPredictor(dtype=dt, name="delta_box_predictor")(
            memory, anchors, clamp_wh
        )

        # top-k by foreground logit (918-943).
        k = cfg.num_queries
        _, topk_idx = jax.lax.top_k(enc_logits[..., 0], k)
        take = lambda arr: jnp.take_along_axis(
            arr, topk_idx[..., None], axis=1
        )
        topk_boxes = take(enc_boxes)
        topk_logits = take(enc_logits)
        return enc_logits, enc_boxes, topk_boxes, topk_logits, topk_idx


class CubifyTransformer(nn.Module):
    """Full CuTR detector; `__call__` returns the packaged top-k detections."""

    cfg: CuTRConfig = CuTRConfig()

    def setup(self):
        cfg = self.cfg
        dt = cfg.dtype
        self.backbone = ViT(
            embed_dim=cfg.embed_dim,
            num_heads=cfg.vit_heads,
            depth_modality=cfg.depth_model,
            layer_scale=not cfg.depth_model,
            encoder_norm=not cfg.depth_model,
            pretrain_img_size=512 if not cfg.depth_model else 224,
            dtype=dt,
            attn_impl=cfg.attn_impl,
            name="vit",
        )
        self.pos_embedding = CameraRayEmbedding(cfg.decoder_dim, dtype=dt, name="camera_ray")
        self.input_proj_conv = nn.Conv(
            cfg.decoder_dim, (1, 1), padding="VALID", dtype=dt, name="input_proj_conv"
        )
        self.input_proj_norm = nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=dt, name="input_proj_norm"
        )
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (1, cfg.decoder_dim)
        )
        self.proposals = EncoderProposals(cfg, name="encoder_proposals")
        self.query_embed = self.param(
            "query_embed",
            nn.initializers.normal(1.0),
            (cfg.max_query_embeds, cfg.decoder_dim),
        )
        self.metric_query_embed = self.param(
            "metric_query_embed", nn.initializers.normal(1.0), (cfg.num_metric_tokens, cfg.decoder_dim)
        )
        self.box_2d_encoder = Box2DPromptEncoderLearned(
            cfg.decoder_dim, dtype=dt, name="box_2d_encoder"
        )
        self.layers = [
            DecoderLayer(d_model=cfg.decoder_dim, dtype=dt, name=f"decoder_layer_{i}")
            for i in range(cfg.num_decoder_layers)
        ]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="decoder_norm")
        self.scale_predictors = [
            ScalePredictor(dtype=dt, name=f"scale_predictor_{i}")
            for i in range(cfg.num_decoder_layers)
        ]
        self.class_predictors = [
            ClassPredictor(dtype=dt, name=f"class_predictor_{i}")
            for i in range(cfg.num_decoder_layers)
        ]
        self.box2d_predictors = [
            DeltaBox2DPredictor(dtype=dt, name=f"box2d_predictor_{i}")
            for i in range(cfg.num_decoder_layers)
        ]
        self.box3d_predictors = [
            AbsoluteBox3DPredictor(dtype=dt, name=f"box3d_predictor_{i}")
            for i in range(cfg.num_decoder_layers)
        ]

    def __call__(self, batch: FrameBatch, train: bool = False) -> Dict[str, Any]:
        cfg = self.cfg
        B = batch.image.shape[0]
        S = batch.image.shape[1]
        F = S // 16
        clamp_wh = (jnp.float32(S), jnp.float32(S))

        feat = self.backbone(batch.image, batch.depth)  # (B, F, F, D)
        src2d = self.input_proj_norm(self.input_proj_conv(feat))

        pos2d = self.pos_embedding(batch.K, batch.image_hw, F)  # (B, F, F, 256)
        src = src2d.reshape(B, F * F, -1)
        pos = pos2d.reshape(B, F * F, -1) + self.level_embed[0]

        enc_logits, enc_boxes, topk_boxes, topk_logits, topk_idx = self.proposals(
            src2d, clamp_wh
        )

        nq = cfg.num_queries
        nm = cfg.num_metric_tokens
        ntot = nq + nm

        box_queries = jnp.broadcast_to(
            self.query_embed[None, :nq], (B, nq, cfg.decoder_dim)
        )
        box_pos = self.box_2d_encoder(jax.lax.stop_gradient(topk_boxes))
        metric_queries = jnp.broadcast_to(
            self.metric_query_embed[None], (B, nm, cfg.decoder_dim)
        )

        output = jnp.concatenate([metric_queries, box_queries], axis=1).astype(cfg.dtype)
        query_pos = jnp.concatenate(
            [jnp.zeros_like(metric_queries), box_pos.astype(jnp.float32)], axis=1
        ).astype(cfg.dtype)
        src = src.astype(cfg.dtype)
        pos = pos.astype(cfg.dtype)

        # Block-diagonal self-attention mask between prompt groups
        # (Prompt.cat, cubify_transformer.py:680-702). True = blocked.
        mask = np.ones((ntot, ntot), dtype=bool)
        mask[:nm, :nm] = False
        mask[nm:, nm:] = False
        self_attn_mask = jnp.asarray(mask)

        reference_2d = topk_boxes  # cxcywh
        intermediates = []
        pred = None
        for lid, layer in enumerate(self.layers):
            output = layer(
                output,
                query_pos,
                jax.lax.stop_gradient(reference_2d),
                src,
                pos,
                (F, F),
                self_attn_mask,
                nm,
            )
            x = self.decoder_norm(output)
            depth_params_pred = self.scale_predictors[lid](x[:, :nm])
            xb = x[:, nm:]
            logits = self.class_predictors[lid](xb)
            _, boxes = self.box2d_predictors[lid](xb, reference_2d, clamp_wh)
            # RGB-D: de-whiten with the GT depth whitening (the reference's
            # WhitenedDepthMeasurementInfo branch, cubify_transformer.py:
            # 568-586); RGB-only: use the metric tokens' predicted (shift,
            # scale) like the reference's monocular path.
            scale_params = (
                batch.depth_params if cfg.depth_model else depth_params_pred
            )
            box3d = self.box3d_predictors[lid](
                xb, boxes, scale_params, clamp_wh
            )
            pred = dict(
                logits=logits,
                boxes=boxes,
                object_desc=xb,
                depth_params_pred=depth_params_pred,
                **box3d,
            )
            if train:
                intermediates.append(pred)
            reference_2d = boxes

        out = self._inference(pred, batch)
        out["enc_logits"] = enc_logits
        out["enc_boxes"] = enc_boxes
        if train:
            out["intermediates"] = intermediates
        return out

    def _inference(self, pred: Dict[str, jnp.ndarray], batch: FrameBatch):
        """Per-image top-k packaging (cubify_transformer.py:945-996)."""
        cfg = self.cfg

        def single(pred_b, K, image_hw, T_gravity):
            logits = pred_b["logits"]            # (nq, 2)
            probs = jax.nn.sigmoid(logits).reshape(-1)
            scores, idx = jax.lax.top_k(probs, cfg.topk_per_image)
            box_idx = idx // logits.shape[-1]
            labels = idx % logits.shape[-1]

            boxes = box_cxcywh_to_xyxy(pred_b["boxes"])[box_idx]
            h, w = image_hw[0], image_hw[1]
            hi = jnp.stack([w, h, w, h])
            boxes = jnp.clip(boxes, 0.0, hi)

            proj_xy = pred_b["proj_xy"][box_idx]
            z = pred_b["z_scaled"][box_idx]
            dims = pred_b["dims"][box_idx]
            pose = pred_b["pose"][box_idx]
            desc = pred_b["object_desc"][box_idx].astype(jnp.float32)
            sel_logits = logits[box_idx]

            # backproject through K^-1 (985-988).  Coordinate math: full f32
            # even on TPU (bf16 MXU would cost ~cm-scale xyz error).
            hi = jax.lax.Precision.HIGHEST
            uvz = jnp.concatenate([z * proj_xy, z], axis=-1)
            xyz = jnp.einsum("ij,nj->ni", jnp.linalg.inv(K), uvz, precision=hi)
            # gravity-align the pose (991-992).
            pose = jnp.einsum("ij,njk->nik", T_gravity, pose, precision=hi)
            # WHL -> LHW reorder (971-973): head dims are (w, h, l).
            boxes3d = jnp.concatenate([xyz, dims[:, (2, 1, 0)]], axis=-1)

            return dict(
                scores=scores,
                pred_classes=labels,
                pred_boxes=boxes,
                pred_logits=sel_logits,
                boxes3d=boxes3d,
                R=pose,
                proj_xy=proj_xy,
                object_desc=desc,
            )

        return jax.vmap(single)(pred, batch.K, batch.image_hw, batch.T_gravity)


def make_cutr(dimension: int = 768, depth_model: bool = True, **kw) -> CubifyTransformer:
    """Mirror of make_cubify_transformer (cubify_transformer.py:1232-1323).

    ``dtype`` may be a jnp dtype or the strings "float32" / "bfloat16".
    """
    if isinstance(kw.get("dtype"), str):
        kw["dtype"] = jnp.dtype(kw["dtype"]).type
    return CubifyTransformer(CuTRConfig(embed_dim=dimension, depth_model=depth_model, **kw))

"""DETR-style prompt decoder with box-conditioned global cross attention.

Capability targets (reference cubify_transformer.py):
  * GlobalCrossAttention (93-200): full attention from queries to the
    flattened stride-16 feature map, biased by a relative-position term built
    from per-query MLPs over the signed deltas between the query's current
    2D box edges and every feature column / row ("Plain-DETR" rpe,
    146-167).  The bias is applied only to box-prompt queries
    (box_attn_prior_mask, 180-183); metric tokens attend without it.
  * PreNormGlobalDecoderLayer (203-283): pre-norm self-attention over the
    query set (block-diagonal mask between prompt groups), the global cross
    attention, and a ReLU FFN.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchMHA(nn.Module):
    """torch.nn.MultiheadAttention-compatible self-attention (packed qkv).

    `mask` is boolean with True = blocked (torch convention).
    """

    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask: Optional[jnp.ndarray] = None):
        B, Nq, C = q.shape
        Nk = k.shape[1]
        hd = C // self.num_heads

        in_proj_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * C, C))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,))
        out = nn.Dense(C, dtype=self.dtype, name="out_proj")

        in_proj_w = in_proj_w.astype(self.dtype)
        in_proj_b = in_proj_b.astype(self.dtype)
        q, k, v = (t.astype(self.dtype) for t in (q, k, v))
        wq, wk, wv = jnp.split(in_proj_w, 3, axis=0)
        bq, bk, bv = jnp.split(in_proj_b, 3, axis=0)
        qh = (q @ wq.T + bq).reshape(B, Nq, self.num_heads, hd)
        kh = (k @ wk.T + bk).reshape(B, Nk, self.num_heads, hd)
        vh = (v @ wv.T + bv).reshape(B, Nk, self.num_heads, hd)

        # compute-dtype scores, f32 softmax (see models/cutr/vit.py::attend)
        attn = jnp.einsum("bqhc,bkhc->bhqk", qh, kh) * (hd ** -0.5)
        if mask is not None:
            attn = jnp.where(mask[None, None], -jnp.inf, attn)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(vh.dtype)
        o = jnp.einsum("bhqk,bkhc->bqhc", attn, vh).reshape(B, Nq, C)
        return out(o)


class CpbMlp(nn.Module):
    """Linear-ReLU-Linear(no bias) rpe MLP (cubify_transformer.py:126-130).

    Kept float32 regardless of the model compute dtype: its inputs are raw
    pixel deltas (magnitude up to the padded size) that bf16 would quantize
    to multiples of 4px, and it is a negligible share of decoder FLOPs."""

    hidden_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_dim, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out_dim, use_bias=False, name="fc2")(x)


class GlobalCrossAttention(nn.Module):
    num_heads: int = 8
    rpe_hidden_dim: int = 512
    feature_stride: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,          # (B, Nq, C) -- queries (+pos already added)
        reference_2d: jnp.ndarray,   # (B, Nb, 4) cxcywh boxes of box prompts
        k_input: jnp.ndarray,        # (B, HW, C) src (+pos)
        v_input: jnp.ndarray,        # (B, HW, C) src
        hw: tuple,                   # (h, w) of the single feature level
        num_prefix: int,             # leading queries WITHOUT the rpe prior
    ):
        B, Nq, C = query.shape
        h, w = hw
        hd = C // self.num_heads
        stride = self.feature_stride

        reference_2d = reference_2d.astype(jnp.float32)  # rpe deltas stay f32
        ref = jnp.concatenate(
            [
                reference_2d[..., :2] - reference_2d[..., 2:] / 2,
                reference_2d[..., :2] + reference_2d[..., 2:] / 2,
            ],
            axis=-1,
        )  # (B, Nb, 4) xyxy

        pos_x = (jnp.linspace(0.5, w - 0.5, w) * stride).astype(jnp.float32)
        pos_y = (jnp.linspace(0.5, h - 0.5, h) * stride).astype(jnp.float32)

        # (B, Nb, w, 2): distance from both x-edges to every column center.
        delta_x = ref[..., None, 0::2] - pos_x[None, None, :, None]
        delta_y = ref[..., None, 1::2] - pos_y[None, None, :, None]

        rpe_x = CpbMlp(self.rpe_hidden_dim, self.num_heads, name="cpb_mlp1")(delta_x)
        rpe_y = CpbMlp(self.rpe_hidden_dim, self.num_heads, name="cpb_mlp2")(delta_y)
        # (B, Nb, h, w, heads) -> (B, heads, Nb, h*w)
        rpe = rpe_x[:, :, None] + rpe_y[:, :, :, None]
        rpe = rpe.reshape(B, ref.shape[1], h * w, self.num_heads).transpose(0, 3, 1, 2)

        q = nn.Dense(C, dtype=self.dtype, name="q")(query).reshape(B, Nq, self.num_heads, hd)
        k = nn.Dense(C, dtype=self.dtype, name="k")(k_input).reshape(B, -1, self.num_heads, hd)
        v = nn.Dense(C, dtype=self.dtype, name="v")(v_input).reshape(B, -1, self.num_heads, hd)

        # compute-dtype scores, f32 softmax (see models/cutr/vit.py::attend);
        # the rpe bias rounds to the score dtype (explicit: an implicit
        # f32->bf16 scatter cast is a FutureWarning on its way to an error)
        attn = jnp.einsum("bqhc,bkhc->bhqk", q * (hd ** -0.5), k)
        # rpe applies to the box queries only (cubify_transformer.py:180-183).
        attn = attn.at[:, :, num_prefix:].add(rpe.astype(attn.dtype))
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(B, Nq, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(o)


class DecoderLayer(nn.Module):
    """PreNormGlobalDecoderLayer (cubify_transformer.py:203-283)."""

    d_model: int = 256
    d_ffn: int = 2048
    n_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, reference_2d, src, src_pos, hw, self_attn_mask, num_prefix):
        # self attention (pre-norm).
        t2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)
        qk = t2 + query_pos
        t2 = TorchMHA(self.n_heads, dtype=self.dtype, name="self_attn")(
            qk, qk, t2, mask=self_attn_mask
        )
        tgt = tgt + t2

        # global cross attention.
        t2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(tgt)
        t2 = GlobalCrossAttention(num_heads=self.n_heads, dtype=self.dtype, name="xattn")(
            t2 + query_pos, reference_2d, src + src_pos, src, hw, num_prefix
        )
        tgt = tgt + t2

        # ffn.
        t2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        t2 = nn.Dense(self.d_ffn, dtype=self.dtype, name="linear1")(t2)
        t2 = nn.relu(t2)
        t2 = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(t2)
        tgt = tgt + t2
        return tgt

"""CLIP image + text towers (flax.linen), open_clip-compatible.

Capability target: the reference's open-vocabulary head relies on an
external CLIP ("SAMCLIP" wrapper, reference demo.py:458-459, not shipped;
the documented fallback is open_clip ViT-H-14, tools/utils.py:342-353).  The
in-repo contract is just two calls:

  * ``get_batch_images_clip_features(images)`` (tools/utils.py:396) -> image
    embeddings for 224x224 crops;
  * ``extract_text_feature(texts)`` (precompute_class_features.py:39) ->
    normalized text embeddings, precomputed offline into
    ``data/class_features.pt`` ([473, 1024] = ViT-H-14 text width).

This module provides both towers natively in flax (bfloat16-friendly,
jit/vmap-ready) with a converter from open_clip / HF state dicts
(convert.py).  Weights must be supplied by the user (zero-egress image);
random init still exercises the full compute path.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    """ViT-H/14 by default (the reference's text-feature source)."""

    image_size: int = 224
    patch: int = 14
    width: int = 1280
    layers: int = 32
    heads: int = 16
    embed_dim: int = 1024
    # text tower
    vocab_size: int = 49408
    context_length: int = 77
    text_width: int = 1024
    text_layers: int = 24
    text_heads: int = 16
    quick_gelu: bool = False
    # compute dtype (params stay f32; softmax + norm stats stay f32; the
    # returned embeddings are f32).  bfloat16 is MXU-native on TPU.
    dtype: Any = jnp.float32
    # Attention implementation for unmasked (image-tower) blocks:
    #   "xla"    -- einsum scores + f32 softmax (the portable default);
    #   "kernel" -- whole-sequence Pallas kernel (ops/attention_kernel.py):
    #               scores/softmax stay in VMEM, ~7% off the ViT-L tower at
    #               the 128-crop label batch (profile_clip_attn.py);
    #   "auto"   -- "kernel" on TPU backends, "xla" elsewhere.
    # Masked (text-tower causal) blocks always use the xla path.
    attn_impl: str = "auto"

    @staticmethod
    def vit_l14() -> "CLIPConfig":
        return CLIPConfig(
            patch=14, width=1024, layers=24, heads=16, embed_dim=768,
            text_width=768, text_layers=12, text_heads=12, quick_gelu=True,
        )

    @staticmethod
    def vit_h14() -> "CLIPConfig":
        return CLIPConfig()


def _gelu(x, quick: bool):
    return x * jax.nn.sigmoid(1.702 * x) if quick else nn.gelu(x, approximate=False)


class ResidualBlock(nn.Module):
    heads: int
    quick_gelu: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)

        w_in = self.param("attn_in_proj_weight", nn.initializers.xavier_uniform(), (3 * d, d))
        b_in = self.param("attn_in_proj_bias", nn.initializers.zeros, (3 * d,))
        qkv = h @ w_in.T.astype(self.dtype) + b_in.astype(self.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        B, N, _ = q.shape
        hd = d // self.heads
        if self.attn_impl == "kernel" and mask is None:
            # whole-sequence Pallas attention: scores/softmax never touch
            # HBM (ops/attention_kernel.py).  Same numerics contract as the
            # xla path below: f32-accumulated score dot, f32 softmax,
            # probabilities cast to the value dtype.
            from boxfusion_tpu.ops.attention_kernel import whole_seq_attention

            o = whole_seq_attention(q, k, v, heads=self.heads,
                                    sm_scale=hd ** -0.5)
        else:
            q = q.reshape(B, N, self.heads, hd)
            k = k.reshape(B, N, self.heads, hd)
            v = v.reshape(B, N, self.heads, hd)
            # scores in the COMPUTE dtype, softmax statistics in f32.  The
            # f32 score tensor was the tower's top cost at the labeling
            # batch size (B=128, T=257: 540 MB/layer of HBM traffic;
            # measured 8.6 vs 4.2 ms/layer) -- in f32 mode this is
            # bit-identical to an f32 score matmul, so CPU parity tests are
            # unaffected.
            attn = jnp.einsum("bqhc,bkhc->bhqk", q * (hd ** -0.5), k)
            if mask is not None:
                attn = attn + mask
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(v.dtype)
            o = jnp.einsum("bhqk,bkhc->bqhc", attn, v).reshape(B, N, d)
        x = x + nn.Dense(d, dtype=self.dtype, name="attn_out_proj")(o)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        h = nn.Dense(4 * d, dtype=self.dtype, name="mlp_fc")(h)
        h = _gelu(h, self.quick_gelu)
        x = x + nn.Dense(d, dtype=self.dtype, name="mlp_proj")(h)
        return x


class CLIPImageTower(nn.Module):
    """open_clip VisionTransformer: patchify, cls token, pre/post LN, proj."""

    cfg: CLIPConfig = CLIPConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, 224, 224, 3) already CLIP-normalized.

        Returns (B, embed_dim) unnormalized embeddings."""
        c = self.cfg
        x = nn.Conv(
            c.width,
            (c.patch, c.patch),
            strides=(c.patch, c.patch),
            padding="VALID",
            use_bias=False,
            dtype=c.dtype,
            name="conv1",
        )(images.astype(c.dtype))
        B = x.shape[0]
        x = x.reshape(B, -1, c.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (c.width,))
        cls = cls.astype(c.dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls[None, None], (B, 1, c.width)), x], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            ((c.image_size // c.patch) ** 2 + 1, c.width),
        )
        x = x + pos[None].astype(c.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="ln_pre")(x)
        impl = c.attn_impl
        if impl == "auto":
            impl = "kernel" if jax.default_backend() not in ("cpu",) else "xla"
        for i in range(c.layers):
            x = ResidualBlock(c.heads, c.quick_gelu, dtype=c.dtype,
                              attn_impl=impl, name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(c.width ** -0.5), (c.width, c.embed_dim)
        )
        # final projection + cosine-similarity math downstream stay f32
        return x.astype(jnp.float32) @ proj


class CLIPTextTower(nn.Module):
    """open_clip text transformer with causal mask + EOT pooling."""

    cfg: CLIPConfig = CLIPConfig()

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """tokens: (B, 77) int32.  Returns (B, embed_dim)."""
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.text_width, dtype=c.dtype, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01), (c.context_length, c.text_width)
        )
        x = emb + pos[None].astype(c.dtype)
        L = c.context_length
        causal = jnp.where(
            jnp.tril(jnp.ones((L, L), bool)), 0.0, -jnp.inf
        )[None, None]
        for i in range(c.text_layers):
            x = ResidualBlock(c.text_heads, c.quick_gelu, dtype=c.dtype, name=f"resblocks_{i}")(x, mask=causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=c.dtype, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)  # EOT token has the highest id
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        proj = self.param(
            "text_projection",
            nn.initializers.normal(c.text_width ** -0.5),
            (c.text_width, c.embed_dim),
        )
        return pooled.astype(jnp.float32) @ proj

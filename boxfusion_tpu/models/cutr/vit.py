"""RGB-D ViT backbone (flax.linen), TPU-first layout (NHWC).

Capability target: the reference's self-contained ViTDet-style backbone with
joint RGB-D windowed attention (reference boxfusion/vit.py:16-521):

  * separate 16x16 patch embeds for RGB (3ch) and depth (1ch)
    (vit.py:416-448), each with its own absolute position embedding
    bicubic-resized from the 224/16=14 pretraining grid (vit.py:60-86);
  * 12 blocks; window attention (window 16) on blocks {0,1,3,4,6,7,9,10}
    where RGB and depth tokens attend *jointly*: q/k/v of both modalities are
    concatenated along the sequence, one score matrix is computed, then split
    per-modality before softmax (vit.py:170-203);
  * the depth window size is the RGB window divided by the RGB/depth
    resolution ratio, restricted to {4, 8, 16} (vit.py:205,289-307);
  * global blocks {2,5,8,11} attend RGB only (vit.py:466,511-515);
  * the MLP is shared between modalities within a block (vit.py:326-340).

Window partitioning zero-pads token maps to window multiples and lets the
padded tokens participate in attention, exactly like the reference
(vit.py:16-58 pads without masking).

Mixed precision: every module takes a ``dtype`` compute dtype (parameters
stay float32).  With ``dtype=bfloat16`` the matmuls run MXU-native; attention
scores are accumulated and softmaxed in float32 and LayerNorm statistics are
float32 (flax default), so only the bandwidth-bound tensors drop precision.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from boxfusion_tpu.models.cutr.layers import resize_pos_embed

DEPTH_WINDOW_SIZES = (4, 8, 16)


def window_partition(x: jnp.ndarray, window: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B*nW, win, win, C), zero-padding to window multiples."""
    B, H, W, C = x.shape
    pad_h = (-H) % window
    pad_w = (-W) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window, window, Wp // window, window, C)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, C)
    return x, (Hp, Wp)


def window_unpartition(
    windows: jnp.ndarray, window: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window // window)
    x = windows.reshape(B, Hp // window, Wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W]


class PatchEmbed(nn.Module):
    """16x16 stride-16 conv patchifier (vit.py:102-128), NHWC in/out."""

    embed_dim: int
    patch: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch, self.patch),
            strides=(self.patch, self.patch),
            padding="VALID",
            dtype=self.dtype,
            name="proj",
        )(x)


class JointAttention(nn.Module):
    """Multi-head attention with optional joint RGB-D tokens (vit.py:130-203).

    Both modalities share the qkv / proj weights.  Scores are computed over
    the concatenated key sequence; the softmax is applied separately to the
    RGB-query block and the depth-query block (matching the reference's
    split-after-matmul) -- since softmax is per query ROW over the full key
    axis, stacking both query blocks into one call is bit-equivalent.

    ``attn_impl="kernel"`` routes through the whole-sequence Pallas kernel
    (ops/attention_kernel.py).  Completion-forced round-5 A/B at CuTR-768 @
    512px: kernel 7.67 ms vs xla 5.71 ms full-forward -- the kernel LOSES
    here (4 windows / 1 global sequence make a grid too short to pipeline,
    and the score tensors are only ~25 MB/layer), while the same kernel
    wins 23% on the CLIP tower (128 crops = 128 pipelined grid cells,
    270 MB/layer of score traffic).  Default stays "xla"; the knob exists
    for future shapes.  (The round-4 ablation's "XLA 23x faster" figure,
    tools/pallas_attention_ablation.py, was an enqueue-rate artifact; the
    direction was right, the magnitude fictional.)
    """

    num_heads: int
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, depth=None):
        B, H, W, C = x.shape
        hd = C // self.num_heads
        scale = hd ** -0.5

        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")
        proj = nn.Dense(C, dtype=self.dtype, name="proj")

        if self.attn_impl == "kernel":
            from boxfusion_tpu.ops.attention_kernel import whole_seq_attention

            def split_flat(t, n):
                # heads stay packed along the channel axis (head h = columns
                # [h*hd, (h+1)*hd)), exactly the kernel's expected layout
                r = qkv(t).reshape(B, n, 3, C)
                return r[:, :, 0], r[:, :, 1], r[:, :, 2]

            n_rgb = H * W
            q, k, v = split_flat(x.reshape(B, n_rgb, C), n_rgb)
            if depth is not None:
                _, Hd, Wd, _ = depth.shape
                qd, kd, vd = split_flat(depth.reshape(B, Hd * Wd, C), Hd * Wd)
                q = jnp.concatenate([q, qd], axis=1)
                k = jnp.concatenate([k, kd], axis=1)
                v = jnp.concatenate([v, vd], axis=1)
            o = whole_seq_attention(q, k, v, heads=self.num_heads,
                                    sm_scale=scale)
            o = proj(o)
            out = o[:, :n_rgb].reshape(B, H, W, C)
            out_d = (
                o[:, n_rgb:].reshape(B, Hd, Wd, C) if depth is not None else None
            )
            return out, out_d

        def split_qkv(t, n):
            # (B, N, 3, heads, hd) matching torch's packed reshape.
            r = qkv(t).reshape(B, n, 3, self.num_heads, hd)
            return r[:, :, 0], r[:, :, 1], r[:, :, 2]  # each (B, N, heads, hd)

        def attend(qh, kh, vh):
            # scores in the compute dtype, softmax statistics in f32 (an f32
            # score tensor doubles attention HBM traffic -- measured 2x on
            # the CLIP tower, models/clip/model.py; f32 mode is unchanged).
            a = jnp.einsum("bqhc,bkhc->bhqk", qh * scale, kh)
            a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(vh.dtype)
            return jnp.einsum("bhqk,bkhc->bqhc", a, vh)

        q, k, v = split_qkv(x.reshape(B, H * W, C), H * W)

        if depth is not None:
            _, Hd, Wd, _ = depth.shape
            qd, kd, vd = split_qkv(depth.reshape(B, Hd * Wd, C), Hd * Wd)
            k = jnp.concatenate([k, kd], axis=1)
            v = jnp.concatenate([v, vd], axis=1)

            out_d = attend(qd, k, v).reshape(B, Hd, Wd, C)
            out_d = proj(out_d)
        else:
            out_d = None

        out = attend(q, k, v).reshape(B, H, W, C)
        out = proj(out)
        return out, out_d


class Mlp(nn.Module):
    """timm-style MLP (fc1/act/fc2) used by the reference blocks (vit.py:274)."""

    hidden_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(dim, dtype=self.dtype, name="fc2")(x)


class Block(nn.Module):
    """Pre-norm transformer block with optional windowing + depth modality
    (vit.py:206-342)."""

    num_heads: int
    mlp_ratio: float = 4.0
    window_size: int = 0
    depth_modality: bool = False
    layer_scale: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, depth=None):
        dim = x.shape[-1]
        norm1 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")
        mlp = Mlp(int(dim * self.mlp_ratio), dtype=self.dtype, name="mlp")
        attn = JointAttention(
            self.num_heads, dtype=self.dtype, attn_impl=self.attn_impl,
            name="attn",
        )
        if self.layer_scale:
            ls1 = self.param("ls1_gamma", nn.initializers.ones, (dim,))
            ls2 = self.param("ls2_gamma", nn.initializers.ones, (dim,))
            ls1 = ls1.astype(self.dtype)
            ls2 = ls2.astype(self.dtype)

        shortcut = x
        xn = norm1(x)

        use_depth = self.depth_modality and depth is not None
        if self.window_size > 0:
            H, W = xn.shape[1], xn.shape[2]
            xn, pad_hw = window_partition(xn, self.window_size)

        if use_depth:
            shortcut_depth = depth
            dn = norm1(depth)
            Hd, Wd = dn.shape[1], dn.shape[2]
            # Depth window derived from the RGB/depth resolution ratio
            # (vit.py:296-304); static shapes make this a Python int.
            dws = int(self.window_size // (H / Hd))
            if dws not in DEPTH_WINDOW_SIZES:
                raise ValueError(f"Unexpected depth window size {dws}")
            dn, pad_hw_d = window_partition(dn, dws)
            xn, dn = attn(xn, dn)
            dn = window_unpartition(dn, dws, pad_hw_d, (Hd, Wd))
        else:
            xn, _ = attn(xn)

        if self.window_size > 0:
            xn = window_unpartition(xn, self.window_size, pad_hw, (H, W))

        if self.layer_scale:
            xn = xn * ls1
            if use_depth:
                dn = dn * ls1

        x = shortcut + xn
        y = mlp(norm2(x))
        if self.layer_scale:
            y = y * ls2
        x = x + y

        if use_depth:
            depth = shortcut_depth + dn
            yd = mlp(norm2(depth))
            if self.layer_scale:
                yd = yd * ls2
            depth = depth + yd

        return x, depth


class ViT(nn.Module):
    """RGB-D ViT backbone (vit.py:344-521).

    __call__(image, depth) takes NHWC image (B, S, S, 3) and depth
    (B, Sd, Sd, 1); returns the stride-16 feature map (B, S/16, S/16, C).
    """

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 16
    window_block_indexes: Sequence[int] = (0, 1, 3, 4, 6, 7, 9, 10)
    depth_modality: bool = True
    layer_scale: bool = False
    encoder_norm: bool = False
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    patch: int = 16
    dtype: Any = jnp.float32
    # "auto" -> whole-sequence Pallas attention on TPU backends, the xla
    # einsum path elsewhere (see JointAttention; CuTR overrides to "xla" --
    # the kernel loses at its shapes).
    attn_impl: str = "auto"

    @nn.compact
    def __call__(self, image: jnp.ndarray, depth: Optional[jnp.ndarray] = None):
        grid = self.pretrain_img_size // self.patch
        n_pos = grid * grid + (1 if self.pretrain_use_cls_token else 0)

        image = image.astype(self.dtype)
        x = PatchEmbed(self.embed_dim, dtype=self.dtype, name="patch_embed")(image)
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, n_pos, self.embed_dim),
        )
        p = pos[:, 1:] if self.pretrain_use_cls_token else pos
        # bicubic resize in f32, cast once (exactness of the matrix matters
        # for parity; the cast is the same rounding the patch tokens see).
        x = x + resize_pos_embed(p, grid, (x.shape[1], x.shape[2])).astype(self.dtype)

        d = None
        if self.depth_modality and depth is not None:
            depth = depth.astype(self.dtype)
            d = PatchEmbed(self.embed_dim, dtype=self.dtype, name="patch_embed_depth")(depth)
            pos_d = self.param(
                "pos_embed_depth", nn.initializers.zeros, (1, n_pos, self.embed_dim)
            )
            pd = pos_d[:, 1:] if self.pretrain_use_cls_token else pos_d
            d = d + resize_pos_embed(pd, grid, (d.shape[1], d.shape[2])).astype(self.dtype)

        impl = self.attn_impl
        if impl == "auto":
            impl = "kernel" if jax.default_backend() not in ("cpu",) else "xla"
        for i in range(self.depth):
            is_window = i in self.window_block_indexes
            blk = Block(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                window_size=self.window_size if is_window else 0,
                # Reference: depth participates only in window blocks
                # (vit.py:466, cubify_transformer.py:1254-1264).
                depth_modality=self.depth_modality and is_window,
                layer_scale=self.layer_scale,
                dtype=self.dtype,
                attn_impl=impl,
                name=f"blocks_{i}",
            )
            if blk.depth_modality and d is not None:
                x, d = blk(x, d)
            else:
                x, _ = blk(x)

        if self.encoder_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="encoder_norm")(x)
        return x

"""Pallas TPU attention kernel for the ViT global blocks.

The reference's global (non-window) ViT blocks materialize the full
(N x N) score matrix in HBM through torch eager ops (reference
vit.py:190-195); under XLA the same einsum chain is already fused, but the
score tensor still round-trips HBM at the largest feature sizes.  This
kernel keeps everything in VMEM: each grid cell loads one query tile plus
the whole K/V for its (batch*head) slice and writes only the output tile.

Sizing rationale: CuTR's global attention runs at N = (S/16)^2 <= 4096
tokens with head_dim 64, so K/V per head is <= 4096 x 64 x 4B = 1 MiB and a
(128, N) score tile is <= 2 MiB -- the whole working set fits VMEM with
room to spare, making a single-pass tiled softmax strictly better than an
online-softmax flash loop (no rescaling traffic).  For longer sequences
fall back to jax.nn.dot_product_attention or the builtin pallas flash op.

MEASURED STATUS (v5e, CuTR-768 @ 512px, f32 inputs): XLA's fused attention
(default MXU precision, bf16 inputs / f32 accum) runs the full model at
0.32 ms/frame vs 7.5 ms with this kernel engaged -- at N <= 4096 the score
matrix never leaves the fusion XLA already builds, and this kernel pays
full-f32 MXU + 64-lane underutilization.

DECISION (round 4): demoted from the product package (was
boxfusion_tpu/ops/attention.py behind CuTRConfig.use_pallas_attention) to
this ablation record.  At CuTR's largest input bucket (1024px -> N = 4096,
head_dim 64) the per-head score tile still fits the fusion XLA builds, so
even a bf16 head-packed rewrite would be racing a fully-fused op it cannot
beat on memory traffic; flash-style kernels only pay off once the score
matrix spills (N >> 4096), which no reference workload reaches
(vit.py:482 caps inputs at 1024px).  Parity vs plain XLA attention stays
covered by tests/test_ops.py (interpret mode).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # (bq, D)
    k = k_ref[0]  # (N, D)
    v = v_ref[0]  # (N, D)

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # (bq, N)

    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def tiled_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Softmax attention with VMEM-resident K/V.

    Args:
      q, k, v: (BH, N, D) -- batch*heads leading, D = head_dim.
      block_q: query tile (padded N must be divisible).
      interpret: force pallas interpret mode (defaults to True off-TPU so
        tests run anywhere).

    Returns:
      (BH, N, D) attention output, same dtype as q.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    BH, N, D = q.shape
    scale = D ** -0.5

    pad_n = (-N) % block_q
    if pad_n:
        # pad queries (outputs sliced off) and keys with -inf-free zeros plus
        # a mask via score bias is unnecessary: padded K rows would corrupt
        # softmax, so pad K/V by replicating row 0 and masking is needed --
        # instead require tile divisibility by padding q only and keeping k
        # exact; simplest: fall back to one tile when N is small.
        q = jnp.pad(q, ((0, 0), (0, pad_n), (0, 0)))
    n_pad = q.shape[1]

    grid = (BH, n_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((BH, n_pad, D), q.dtype),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, N, D), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, D), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :N]


def reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain XLA attention with identical semantics (for parity tests)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqc,bkc->bqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkc->bqc", p, v)

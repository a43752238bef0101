"""Whole-sequence multi-head attention as a Pallas TPU kernel.

Built for the CLIP image tower's label batch (B crops x 257 tokens x 16
heads x 64 head-dim): XLA's general path materializes the (B, H, T, T)
score tensor in HBM and round-trips it through an f32 softmax -- measured
4.3 ms/layer of pure memory traffic on top of the 5.8 ms matmul floor at
B=128 (tools/profile_clip_attn.py).  The stock
``jax.experimental.pallas.ops.tpu.flash_attention`` is built for LONG
sequences and loses 2x at this shape (20.7 ms/layer: tiny blocks, huge
grids).  Here one grid cell handles one sequence: all heads' scores,
softmax and output for a 384-token pad live entirely in VMEM (~4 MB), so
the only HBM traffic is q/k/v in and o out.

Semantics match the XLA formulation in ``models/clip/model.py``
(scores bf16-in/f32-accumulated, f32 softmax, probabilities cast back to
the value dtype) so swapping implementations changes results only at the
level of dot-product reassociation.

No equivalent exists in the reference -- its CLIP runs through torch SDPA
on GPU (reference tools/utils.py:383-403 delegates to SAMCLIP).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, t_real: int,
            scale: float):
    TQ = q_ref.shape[1]
    TK = k_ref.shape[1]
    hd = q_ref.shape[2] // heads
    needs_mask = TK > t_real
    if needs_mask:
        col = jax.lax.broadcasted_iota(jnp.int32, (TQ, TK), 1)
        neg = jnp.float32(-1e30)
    for h in range(heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if needs_mask:
            s = jnp.where(col < t_real, s, neg)
        p = jax.nn.softmax(s, axis=-1).astype(vh.dtype)
        o = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def whole_seq_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        heads: int, sm_scale: float,
                        interpret: bool = False) -> jnp.ndarray:
    """Full (non-causal) MHA with per-sequence VMEM-resident scores.

    Queries pad to the 16-sublane tile, keys/values to the 128-lane tile
    (the score tensor is (TQ, TK)); a tighter query pad matters because
    the softmax's exp is VPU-bound and scales with TQ*TK.

    Args:
      q, k, v: (B, T, D) with D = heads * head_dim, heads interleaved the
        torch way (head h = columns [h*hd, (h+1)*hd)).
      heads: head count.  sm_scale: score scale (usually head_dim**-0.5).

    Returns:
      (B, T, D) attention output in q's dtype.
    """
    B, T, D = q.shape
    TQ = pl.cdiv(T, 16) * 16
    TK = pl.cdiv(T, 128) * 128
    q = jnp.pad(q, ((0, 0), (0, TQ - T), (0, 0))) if TQ > T else q
    if TK > T:
        pads = ((0, 0), (0, TK - T), (0, 0))
        k = jnp.pad(k, pads)
        v = jnp.pad(v, pads)

    def spec(tp):
        return pl.BlockSpec((1, tp, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, t_real=T, scale=sm_scale),
        grid=(B,),
        in_specs=[spec(TQ), spec(TK), spec(TK)],
        out_specs=spec(TQ),
        out_shape=jax.ShapeDtypeStruct((B, TQ, D), q.dtype),
        interpret=interpret,  # CPU parity tests drive the same kernel
    )(q, k, v)
    return out[:, :T] if TQ > T else out

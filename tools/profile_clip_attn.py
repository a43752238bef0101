"""Where do the CLIP tower's non-matmul milliseconds go? (completion-forced)

Times one ViT-L-scale residual block at the label batch size (B crops,
257 tokens, 1024 width, 16 heads, bf16) in variants:
  full      -- the shipped ResidualBlock (f32 softmax statistics)
  nosmax    -- scores @ v without softmax (isolates softmax + cast cost)
  flash     -- jax.experimental pallas TPU flash_attention (padded to 384)
  mlponly   -- LN + MLP only (no attention at all)

Run: python tools/profile_clip_attn.py [B]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
T, D, H = 257, 1024, 16
HD = D // H
DT = jnp.bfloat16
LAYERS = 8  # chained blocks per timed dispatch


def _params(rng):
    s = 0.02
    return dict(
        w_in=jnp.asarray(rng.randn(3 * D, D) * s, jnp.float32),
        b_in=jnp.zeros((3 * D,), jnp.float32),
        w_out=jnp.asarray(rng.randn(D, D) * s, jnp.float32),
        w_fc=jnp.asarray(rng.randn(D, 4 * D) * s, jnp.float32),
        w_proj=jnp.asarray(rng.randn(4 * D, D) * s, jnp.float32),
    )


def _ln(x):
    m = jnp.mean(x.astype(jnp.float32), -1, keepdims=True)
    v = jnp.var(x.astype(jnp.float32), -1, keepdims=True)
    return ((x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5)).astype(x.dtype)


def block(x, p, attn_impl):
    h = _ln(x)
    qkv = h @ p["w_in"].T.astype(DT) + p["b_in"].astype(DT)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(B, T, H, HD)
    k = k.reshape(B, T, H, HD)
    v = v.reshape(B, T, H, HD)
    if attn_impl == "full":
        a = jnp.einsum("bqhc,bkhc->bhqk", q * (HD ** -0.5), k)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhc->bqhc", a, v).reshape(B, T, D)
    elif attn_impl == "nosmax":
        a = jnp.einsum("bqhc,bkhc->bhqk", q * (HD ** -0.5), k)
        o = jnp.einsum("bhqk,bkhc->bqhc", a * 1e-3, v).reshape(B, T, D)
    elif attn_impl == "flash":
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, SegmentIds, flash_attention,
        )

        TP = 384  # pad tokens to a lane-friendly size
        pad = TP - T

        def pad_t(t):
            return jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))

        qf = pad_t(q).transpose(0, 2, 1, 3)  # (B, H, TP, HD)
        kf = pad_t(k).transpose(0, 2, 1, 3)
        vf = pad_t(v).transpose(0, 2, 1, 3)
        # mask padded keys via segment ids (O(B*T), vs the O(B*H*T^2) ab
        # bias that costs more HBM traffic than it saves)
        seg = (jnp.arange(TP) >= T).astype(jnp.int32)[None].repeat(B, 0) + 1
        o = flash_attention(
            qf, kf, vf, segment_ids=SegmentIds(q=seg, kv=seg),
            sm_scale=HD ** -0.5,
            block_sizes=BlockSizes(
                block_q=128, block_k_major=128, block_k=128, block_b=1
            ),
        )
        o = o.transpose(0, 2, 1, 3)[:, :T].reshape(B, T, D)
    elif attn_impl == "kernel":
        from boxfusion_tpu.ops.attention_kernel import whole_seq_attention

        o = whole_seq_attention(
            q.reshape(B, T, D), k.reshape(B, T, D), v.reshape(B, T, D),
            heads=H, sm_scale=HD ** -0.5,
        )
    elif attn_impl == "mlponly":
        o = v.reshape(B, T, D)
    x = x + (o @ p["w_out"].astype(DT))
    h = _ln(x)
    h = h @ p["w_fc"].astype(DT)
    h = jax.nn.gelu(h, approximate=False)
    return x + (h @ p["w_proj"].astype(DT))


def main():
    from boxfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.RandomState(0)
    p = _params(rng)
    x0 = jnp.asarray(rng.randn(B, T, D) * 0.02, DT)

    for impl in ("full", "kernel", "mlponly", "flash"):
        try:
            @jax.jit
            def run(x, impl=impl):
                for _ in range(LAYERS):
                    x = block(x, p, impl)
                return x

            x = run(x0)
            float(jnp.sum(x.astype(jnp.float32)))  # warm + truthful fetch
            t0 = time.perf_counter()
            reps = 4
            for _ in range(reps):
                x = run(x)
            float(jnp.sum(x.astype(jnp.float32)))
            ms = (time.perf_counter() - t0) / reps / LAYERS * 1e3
            print(f"{impl:8s} {ms:7.3f} ms/layer  (x24 = {ms*24:6.1f} ms/tower)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{impl:8s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()

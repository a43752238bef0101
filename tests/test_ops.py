"""Parity test for the parked Pallas attention ablation (interpret mode).

The kernel lost to XLA's fused attention at CuTR token counts (23x, see
tools/pallas_attention_ablation.py MEASURED STATUS) and was demoted from the
product package; this test keeps the ablation artifact honest so the record
stays reproducible.
"""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
from pallas_attention_ablation import (  # noqa: E402
    reference_attention,
    tiled_attention,
)


@pytest.mark.parametrize("n", [256, 320, 576])
def test_tiled_attention_matches_reference(n):
    rng = np.random.RandomState(0)
    bh, d = 4, 64
    q = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    got = tiled_attention(q, k, v, block_q=256, interpret=True)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


class TestWholeSeqAttention:
    """ops/attention_kernel.py vs the xla einsum+softmax formulation
    (models/clip/model.py ResidualBlock) -- same numerics contract."""

    def _xla_ref(self, q, k, v, heads, scale):
        import jax
        import jax.numpy as jnp

        B, T, D = q.shape
        hd = D // heads
        qh = q.reshape(B, T, heads, hd)
        kh = k.reshape(B, T, heads, hd)
        vh = v.reshape(B, T, heads, hd)
        a = jnp.einsum("bqhc,bkhc->bhqk", qh * scale, kh)
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(vh.dtype)
        return jnp.einsum("bhqk,bkhc->bqhc", a, vh).reshape(B, T, D)

    def test_matches_xla_with_ragged_length(self):
        """T=37 exercises both pads (queries -> 48, keys -> 128) and the
        padded-key mask."""
        import jax.numpy as jnp
        import numpy as np

        from boxfusion_tpu.ops.attention_kernel import whole_seq_attention

        rng = np.random.RandomState(0)
        B, T, H, HD = 3, 37, 4, 16
        q = jnp.asarray(rng.randn(B, T, H * HD), jnp.float32)
        k = jnp.asarray(rng.randn(B, T, H * HD), jnp.float32)
        v = jnp.asarray(rng.randn(B, T, H * HD), jnp.float32)
        scale = HD ** -0.5
        out = whole_seq_attention(q, k, v, heads=H, sm_scale=scale,
                                  interpret=True)
        ref = self._xla_ref(q, k, v, H, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_matches_xla_aligned(self):
        import jax.numpy as jnp
        import numpy as np

        from boxfusion_tpu.ops.attention_kernel import whole_seq_attention

        rng = np.random.RandomState(1)
        B, T, H, HD = 2, 128, 2, 64
        q = jnp.asarray(rng.randn(B, T, H * HD), jnp.float32)
        k = jnp.asarray(rng.randn(B, T, H * HD), jnp.float32)
        v = jnp.asarray(rng.randn(B, T, H * HD), jnp.float32)
        out = whole_seq_attention(q, k, v, heads=H, sm_scale=HD ** -0.5,
                                  interpret=True)
        ref = self._xla_ref(q, k, v, H, HD ** -0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

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

"""Parity tests for the Pallas attention kernel (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxfusion_tpu.ops.attention import reference_attention, tiled_attention


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


def test_vit_pallas_flag_matches_xla():
    from boxfusion_tpu.models.cutr.vit import ViT

    rng = jax.random.PRNGKey(0)
    # 256px -> 16x16 = 256 global tokens, enough to engage the pallas path
    x = jax.random.normal(rng, (1, 256, 256, 3))
    d = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 128, 1))

    vit_ref = ViT(embed_dim=96, num_heads=3, depth=4, window_block_indexes=(0, 2),
                  use_pallas=False)
    vit_pal = ViT(embed_dim=96, num_heads=3, depth=4, window_block_indexes=(0, 2),
                  use_pallas=True)
    params = jax.jit(vit_ref.init)(rng, x, d)
    a = jax.jit(vit_ref.apply)(params, x, d)
    b = jax.jit(vit_pal.apply)(params, x, d)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)

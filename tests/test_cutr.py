"""Tests for the CuTR flax port: layers, backbone mechanics, full forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from boxfusion_tpu.models.cutr import CuTRConfig, FrameBatch, make_cutr
from boxfusion_tpu.models.cutr.layers import (
    apply_box_deltas,
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    torch_bicubic_matrix,
)
from boxfusion_tpu.models.cutr.pos import fourier_features, ray_directions_at_features
from boxfusion_tpu.models.cutr.vit import window_partition, window_unpartition


def test_bicubic_matrix_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(1, 3, 14, 14).astype(np.float32)
    for out in (16, 24, 40):
        want = F.interpolate(
            torch.from_numpy(x), size=(out, out), mode="bicubic", align_corners=False
        ).numpy()
        m = torch_bicubic_matrix(14, out)
        got = np.einsum("hi,bcij,wj->bchw", m, x, m)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 24 * 24 * 3, dtype=jnp.float32).reshape(2, 24, 24, 3)
    w, pad_hw = window_partition(x, 16)
    assert w.shape == (2 * 4, 16, 16, 3)
    assert pad_hw == (32, 32)
    back = window_unpartition(w, 16, pad_hw, (24, 24))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_box_format_roundtrip():
    b = jnp.array([[10.0, 20.0, 30.0, 60.0]])  # xyxy
    np.testing.assert_allclose(
        np.asarray(box_cxcywh_to_xyxy(box_xyxy_to_cxcywh(b))), np.asarray(b), atol=1e-5
    )


def test_apply_box_deltas_zero_is_identity():
    boxes = jnp.array([[100.0, 100.0, 40.0, 20.0]])  # cxcywh
    out = apply_box_deltas(jnp.zeros((1, 4)), boxes, (jnp.float32(512), jnp.float32(512)))
    np.testing.assert_allclose(np.asarray(out), [[80.0, 90.0, 120.0, 110.0]], atol=1e-4)


def test_ray_directions_zero_in_padding():
    K = jnp.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    # actual image 96x128, padded square 256 -> F=16; samples at x=16j
    rays = ray_directions_at_features(K, jnp.array([96.0, 128.0]), 16)
    assert rays.shape == (16, 16, 3)
    # in-image rays are unit norm
    norms = np.linalg.norm(np.asarray(rays), axis=-1)
    assert np.allclose(norms[:6, :8], 1.0, atol=1e-5)
    # pad region (16j >= 128 -> j >= 8; 16i >= 96 -> i >= 6) is zero
    assert np.all(norms[6:, :] == 0)
    assert np.all(norms[:, 8:] == 0)


def test_fourier_features_shape():
    x = jnp.zeros((4, 4, 3))
    f = fourier_features(x, dim=256, max_freq=8.0)
    assert f.shape == (4, 4, 255)  # 3 * (256 // 3)
    assert np.all(np.asarray(f) == 0)


@pytest.fixture(scope="module")
def tiny_model():
    model = make_cutr(dimension=192, depth_model=True)
    B, S, r = 1, 256, 4
    batch = FrameBatch(
        image=jnp.zeros((B, S, S, 3)),
        depth=jnp.zeros((B, S // r, S // r, 1)),
        K=jnp.tile(jnp.array([[200.0, 0, 120], [0, 200.0, 90], [0, 0, 1]])[None], (B, 1, 1)),
        image_hw=jnp.array([[192.0, 250.0]]),
        depth_params=jnp.array([[2.0, 0.5]]),
        T_gravity=jnp.tile(jnp.eye(3)[None], (B, 1, 1)),
    )
    params = model.init(jax.random.PRNGKey(0), batch)
    return model, params, batch


def test_cutr_forward_shapes(tiny_model):
    model, params, batch = tiny_model
    out = jax.jit(model.apply)(params, batch)
    k = model.cfg.topk_per_image
    assert out["scores"].shape == (1, k)
    assert out["pred_boxes"].shape == (1, k, 4)
    assert out["boxes3d"].shape == (1, k, 6)
    assert out["R"].shape == (1, k, 3, 3)
    assert out["object_desc"].shape == (1, k, model.cfg.decoder_dim)
    # scores sorted descending (top_k semantics)
    s = np.asarray(out["scores"][0])
    assert np.all(np.diff(s) <= 1e-6)
    # 2D boxes clipped to the actual image size (W=250, H=192)
    b = np.asarray(out["pred_boxes"][0])
    assert b[:, 0::2].max() <= 250.0 + 1e-3
    assert b[:, 1::2].max() <= 192.0 + 1e-3


def test_cutr_poses_are_rotations(tiny_model):
    model, params, batch = tiny_model
    out = model.apply(params, batch)
    R = np.asarray(out["R"][0])
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (R.shape[0], 1, 1)), atol=1e-5)


def test_cutr_gravity_applied(tiny_model):
    model, params, batch = tiny_model
    # flipping T_gravity should left-multiply all output poses
    import dataclasses

    Tg = jnp.tile(
        jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])[None], (1, 1, 1)
    )
    out1 = model.apply(params, batch)
    out2 = model.apply(params, dataclasses.replace(batch, T_gravity=Tg))
    want = np.einsum("ij,njk->nik", np.asarray(Tg[0]), np.asarray(out1["R"][0]))
    np.testing.assert_allclose(np.asarray(out2["R"][0]), want, atol=1e-5)


def test_cutr_bfloat16_compute_path(tiny_model):
    """bf16 compute dtype: same params, f32 outputs, small dense deviation.

    Coordinate decoding / softmax / norm stats stay f32 by design, so the
    dense (pre-top-k) encoder outputs must track the f32 model closely even
    with untrained weights.
    """
    model, params, batch = tiny_model
    import dataclasses

    rng = np.random.RandomState(3)
    batch = dataclasses.replace(
        batch,
        image=jnp.asarray(rng.randn(*batch.image.shape), jnp.float32),
        depth=jnp.asarray(rng.randn(*batch.depth.shape), jnp.float32),
    )
    m16 = make_cutr(dimension=192, depth_model=True, dtype="bfloat16")
    o32 = jax.jit(model.apply)(params, batch)
    o16 = jax.jit(m16.apply)(params, batch)

    # everything the pipeline consumes is float32 regardless of compute dtype
    for k in ("scores", "pred_boxes", "boxes3d", "R", "proj_xy", "object_desc"):
        assert o16[k].dtype == jnp.float32, k

    enc32, enc16 = np.asarray(o32["enc_logits"]), np.asarray(o16["enc_logits"])
    assert np.abs(enc32 - enc16).max() < 0.1
    b32, b16 = np.asarray(o32["enc_boxes"]), np.asarray(o16["enc_boxes"])
    assert np.abs(b32 - b16).max() < 8.0  # px, untrained weights
    s32 = np.sort(np.asarray(o32["scores"]).ravel())
    s16 = np.sort(np.asarray(o16["scores"]).ravel())
    assert np.abs(s32 - s16).max() < 0.05

"""Round-trip tests for the CuTR checkpoint converter."""
import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.models.cutr import FrameBatch, make_cutr
from boxfusion_tpu.models.cutr.convert import (
    convert_cutr_checkpoint,
    flax_to_torch_template,
)


def test_cutr_converter_roundtrip():
    model = make_cutr(dimension=192, depth_model=True)
    B, S, r = 1, 256, 4
    batch = FrameBatch(
        image=jnp.zeros((B, S, S, 3)),
        depth=jnp.zeros((B, S // r, S // r, 1)),
        K=jnp.tile(jnp.eye(3)[None] * 100, (B, 1, 1)),
        image_hw=jnp.array([[200.0, 240.0]]),
        depth_params=jnp.array([[2.0, 0.5]]),
        T_gravity=jnp.tile(jnp.eye(3)[None], (B, 1, 1)),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch)

    sd = flax_to_torch_template(params)
    # width sniffing like demo.py:441-446
    assert sd["backbone.0.patch_embed.proj.weight"].shape[0] == 192

    restored, dim, depth_model = convert_cutr_checkpoint(sd)
    assert dim == 192 and depth_model

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(restored))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        other = flat_b[path]
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(other), atol=1e-6)

    # converted params must produce identical outputs
    out_a = jax.jit(model.apply)(params, batch)
    out_b = jax.jit(model.apply)(restored, batch)
    np.testing.assert_allclose(
        np.asarray(out_a["scores"]), np.asarray(out_b["scores"]), atol=1e-6
    )


def test_converter_rgb_only_variant():
    model = make_cutr(dimension=192, depth_model=False)
    batch = FrameBatch(
        image=jnp.zeros((1, 256, 256, 3)),
        depth=None,
        K=jnp.tile(jnp.eye(3)[None] * 100, (1, 1, 1)),
        image_hw=jnp.array([[200.0, 240.0]]),
        depth_params=jnp.ones((1, 2)),
        T_gravity=jnp.tile(jnp.eye(3)[None], (1, 1, 1)),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch)
    sd = flax_to_torch_template(params)
    assert "backbone.0.blocks.0.ls1.gamma" in sd  # layer-scale variant
    assert "backbone.0.encoder_norm.weight" in sd
    restored, dim, depth_model = convert_cutr_checkpoint(sd)
    assert not depth_model
    assert len(jax.tree.leaves(restored)) == len(jax.tree.leaves(params))


def test_rgb_only_checkpoint_roundtrip_and_detector(tmp_path):
    """A saved RGB-only CuTR .pth loads with depth_model sniffed False and
    the detector drops the stream's depth before packaging."""
    import torch

    from boxfusion_tpu.data.synthetic import SyntheticSequence
    from boxfusion_tpu.models.cutr.convert import load_checkpoint
    from boxfusion_tpu.runtime.detector import CuTRDetector

    model = make_cutr(dimension=192, depth_model=False)
    batch = FrameBatch(
        image=jnp.zeros((1, 256, 256, 3)),
        depth=None,
        K=jnp.tile(jnp.eye(3)[None] * 100, (1, 1, 1)),
        image_hw=jnp.array([[200.0, 240.0]]),
        depth_params=jnp.ones((1, 2)),
        T_gravity=jnp.tile(jnp.eye(3)[None], (1, 1, 1)),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(1), batch)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in flax_to_torch_template(params).items()}
    pth = tmp_path / "cutr_rgb.pth"
    torch.save({"model": sd}, pth)

    params2, dim, depth_model = load_checkpoint(str(pth))
    assert dim == 192 and not depth_model

    # pre-conversion CLI: .pth -> .msgpack -> load_checkpoint roundtrip
    from boxfusion_tpu.models.cutr.convert import main as convert_main

    mp = tmp_path / "cutr_rgb.msgpack"
    assert convert_main([str(pth), str(mp)]) == 0
    params3, dim3, depth3 = load_checkpoint(str(mp))
    assert dim3 == 192 and not depth3
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params2),
        jax.tree_util.tree_leaves_with_path(params3),
    ):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    det = CuTRDetector(make_cutr(dimension=192, depth_model=False), params2)
    frame = next(iter(SyntheticSequence(n_frames=1, n_boxes=3, seed=0)))
    assert frame.depth is not None  # stream has depth; model must ignore it
    out = det(frame)
    assert out["boxes3d"].shape[-1] == 6 and out["scores"].ndim == 1


def test_convert_cli_rejects_non_msgpack_dst(tmp_path):
    """load_checkpoint dispatches on the .msgpack suffix, so the converter
    must refuse to write bytes under a name it could never load back."""
    import pytest

    from boxfusion_tpu.models.cutr.convert import main as convert_main

    with pytest.raises(SystemExit):
        convert_main([str(tmp_path / "in.pth"), str(tmp_path / "out.ckpt")])

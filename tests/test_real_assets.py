"""Real-asset validation gates.

When the reference's shipped binary assets are mounted (they are read-only
under /root/reference/data in the build image), these tests exercise the
REAL loading path and assert the documented contracts:

  * pst_1024_0.tiff: (1024, 6) float32, row 0 = the all-zero identity
    particle (reference box_fusion.py:31-32).
  * class_features.pt: [473, 1024] float (open_clip ViT-H-14 text width),
    pairing 1:1 with panoptic_categories_nomerge.txt (tools/utils.py:342-353).

Weight checkpoints (cutr_rgbd.pth, open_clip) are not shipped; their tests
run when BOXFUSION_CUTR_CKPT / BOXFUSION_CLIP_CKPT point at real files, and
otherwise assert that the loaders fail with actionable error messages.
"""
import os

import numpy as np
import pytest

REF_DATA = "/root/reference/data"
PST = os.path.join(REF_DATA, "pst_1024_0.tiff")
CLASS_FEATURES = os.path.join(REF_DATA, "class_features.pt")
CLASS_TXT = os.path.join(REF_DATA, "panoptic_categories_nomerge.txt")

CUTR_CKPT = os.environ.get("BOXFUSION_CUTR_CKPT", "")
CLIP_CKPT = os.environ.get("BOXFUSION_CLIP_CKPT", "")


# --- PST table ---------------------------------------------------------------

@pytest.mark.skipif(not os.path.exists(PST), reason="reference PST not mounted")
def test_real_pst_contract():
    from boxfusion_tpu.fusion.pst import load_pst

    pst = load_pst(PST, 1024)
    assert pst.shape == (1024, 6)
    assert pst.dtype == np.float32
    np.testing.assert_array_equal(pst[0], np.zeros(6, np.float32))
    # perturbations live in a bounded search cube
    assert np.abs(pst).max() <= 1.5, np.abs(pst).max()
    assert np.abs(pst[1:]).max() > 0.5  # not degenerate


@pytest.mark.skipif(not os.path.exists(PST), reason="reference PST not mounted")
def test_real_pst_drives_optimizer():
    """The shipped table must actually converge the PST optimizer."""
    import jax.numpy as jnp

    from boxfusion_tpu.fusion.optimizer import PSTOptConfig, optimize_boxes
    from boxfusion_tpu.fusion.pst import load_pst
    from tests.test_fusion import _make_views

    pst = jnp.asarray(load_pst(PST, 1024))
    gt = np.array([0.2, -0.1, 0.3, 0.6, 0.4, 0.5], np.float32)
    K = np.array([[300.0, 0, 256], [0, 300.0, 192], [0, 0, 1]], np.float32)
    H, W = 384.0, 512.0
    poses, obs = _make_views(4, gt, K, H, W)
    start = gt + np.array([0.06, -0.05, 0.04, 0.15, -0.1, 0.12], np.float32)

    fused, updated = optimize_boxes(
        jnp.asarray(start[None]),
        jnp.eye(3)[None],
        pst,
        jnp.asarray(poses[None]),
        jnp.asarray(obs[None]),
        jnp.ones((1, 4)),
        jnp.ones(1, bool),
        jnp.asarray(K),
        jnp.float32(H),
        jnp.float32(W),
        PSTOptConfig(iters=20),
    )
    assert bool(updated[0])
    err0 = np.abs(start - gt).sum()
    err1 = np.abs(np.asarray(fused[0]) - gt).sum()
    assert err1 < 0.5 * err0, (err0, err1)


def test_pst_missing_file_message():
    from boxfusion_tpu.fusion.pst import load_pst

    with pytest.raises(FileNotFoundError, match="pst_path"):
        load_pst("/nonexistent/pst.tiff", 1024)


def test_pst_bad_shape_message(tmp_path):
    from PIL import Image

    from boxfusion_tpu.fusion.pst import load_pst

    bad = tmp_path / "bad.tiff"
    Image.fromarray(np.zeros((16, 5), np.float32)).save(bad)
    with pytest.raises(ValueError, match="expected a"):
        load_pst(str(bad), 16)


def test_pst_nonzero_row0_message(tmp_path):
    from PIL import Image

    from boxfusion_tpu.fusion.pst import load_pst

    arr = np.random.RandomState(0).rand(16, 6).astype(np.float32)
    bad = tmp_path / "row0.tiff"
    Image.fromarray(arr).save(bad)
    with pytest.raises(ValueError, match="identity particle"):
        load_pst(str(bad), 16)


# --- class features ----------------------------------------------------------

@pytest.mark.skipif(
    not (os.path.exists(CLASS_FEATURES) and os.path.exists(CLASS_TXT)),
    reason="reference class features not mounted",
)
def test_real_class_features_contract():
    from boxfusion_tpu.models.clip.head import load_class_features
    from boxfusion_tpu.utils.config import read_lines

    tf = load_class_features(CLASS_FEATURES)
    classes = read_lines(CLASS_TXT)
    assert tf.shape == (473, 1024), tf.shape
    assert len(classes) == 473, len(classes)
    assert np.isfinite(tf).all()
    # the reference stores NORMALIZED features (precompute_class_features.py:41)
    norms = np.linalg.norm(tf, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)


@pytest.mark.skipif(
    not (os.path.exists(CLASS_FEATURES) and os.path.exists(CLASS_TXT)),
    reason="reference class features not mounted",
)
def test_real_class_features_drive_labeler():
    """Real text features + real class list through the full labeling path
    (random CLIP weights -- the contract under test is the asset plumbing)."""
    from boxfusion_tpu.models.clip.head import OpenVocabLabeler, load_class_features
    from boxfusion_tpu.models.clip.model import CLIPConfig
    from boxfusion_tpu.utils.config import read_lines

    tiny = CLIPConfig(
        patch=32, width=64, layers=2, heads=2, embed_dim=1024,
        vocab_size=64, context_length=8, text_width=64, text_layers=1, text_heads=2,
    )
    labeler = OpenVocabLabeler(
        read_lines(CLASS_TXT), load_class_features(CLASS_FEATURES), cfg=tiny
    ).init_random(0)
    img = np.random.RandomState(0).randint(0, 255, (96, 128, 3)).astype(np.uint8)
    boxes = np.array([[10, 10, 60, 60], [30, 20, 90, 80]], np.float32)
    categories, feats, sims = labeler(img.astype(np.float32), boxes)
    assert len(categories) == 2
    assert all(c == "" or c in set(read_lines(CLASS_TXT)) for c in categories)
    assert feats.shape == (2, 1024)


def test_class_features_mismatch_message():
    from boxfusion_tpu.models.clip.head import OpenVocabLabeler

    with pytest.raises(ValueError, match="pair up"):
        OpenVocabLabeler(["a", "b"], np.zeros((3, 8), np.float32))
    with pytest.raises(ValueError, match="n_classes"):
        OpenVocabLabeler(["a"], np.zeros(8, np.float32))


# --- weight checkpoints ------------------------------------------------------

@pytest.mark.skipif(not CUTR_CKPT, reason="BOXFUSION_CUTR_CKPT not set")
def test_real_cutr_checkpoint_converts_and_runs():
    import jax

    from boxfusion_tpu.data.synthetic import SyntheticSequence
    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.models.cutr.convert import load_checkpoint
    from boxfusion_tpu.runtime.detector import CuTRDetector

    params, dim, depth_model = load_checkpoint(CUTR_CKPT)
    model = make_cutr(dimension=dim, depth_model=depth_model)
    det = CuTRDetector(model, jax.device_put(params))
    frame = next(iter(SyntheticSequence(n_frames=1, n_boxes=3, seed=0)))
    out = det(frame)
    assert out["scores"].ndim == 1 and np.isfinite(out["scores"]).all()
    assert np.all(np.diff(out["scores"]) <= 1e-6)  # top-k descending
    assert np.isfinite(out["boxes3d"]).all()


def test_cutr_checkpoint_missing_message():
    from boxfusion_tpu.models.cutr.convert import load_checkpoint

    with pytest.raises(FileNotFoundError, match="cutr_rgbd.pth"):
        load_checkpoint("/nonexistent/cutr_rgbd.pth")


def test_cutr_checkpoint_wrong_content_message(tmp_path):
    import torch

    from boxfusion_tpu.models.cutr.convert import load_checkpoint

    bad = tmp_path / "not_cutr.pth"
    torch.save({"some.weight": torch.zeros(3)}, bad)
    with pytest.raises(ValueError, match="CuTR state dict"):
        load_checkpoint(str(bad))


@pytest.mark.skipif(not CLIP_CKPT, reason="BOXFUSION_CLIP_CKPT not set")
def test_real_clip_checkpoint_converts():
    from boxfusion_tpu.models.clip.convert import load_clip_image_params

    params, cfg = load_clip_image_params(CLIP_CKPT)
    assert cfg.embed_dim in (512, 768, 1024)


def test_clip_checkpoint_missing_message():
    from boxfusion_tpu.models.clip.convert import load_clip_image_params

    with pytest.raises(FileNotFoundError, match="open_clip"):
        load_clip_image_params("/nonexistent/clip.pt")

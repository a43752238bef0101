"""Label-stage DECISION parity: the reference's text_prompt chain vs ours.

Drives the reference's own ``scale_boxes`` -> ``crop_image`` ->
``retriev`` -> ``text_prompt`` chain (/root/reference/tools/utils.py:
355-494) and the demo's surrounding keyframe logic (raw-score filter,
clip-coeff boost, background drop -- demo.py:138-171) with a STUB CLIP
whose image feature is a fixed linear map of the crop's mean RGB, and
asserts our shared label stage (runtime/fused.py::label_boost_core, the
single implementation consumed by the fused and batched engines) produces
identical kept labels, boosted scores, and background drops on the same
frame.

Why a stub: the two stacks crop+resize differently (PIL slice + cv2.resize
vs one fused jax scale_and_translate), so real-CLIP features would differ
at resampling-noise level and the comparison would measure interpolation,
not decisions.  The test image is made of SOLID-COLOR stripes and every
scaled box sits strictly inside one stripe, so crop->resize is EXACT in
both implementations and the stub feature (a function of mean RGB alone)
is bit-comparable.  A zero-width box exercises both sides' black-crop
fallback (tools/utils.py:395 vs models/clip/head.py batched_crop_resize).

Skipped when the reference tree is not mounted.
"""
import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

H, W = 96, 128
N_CLASSES = 5
FEAT_DIM = 6
SCALE_BOX = 1.5
CLIP_COEFF = 0.3
RAW_THRESH = 0.4

_rng = np.random.RandomState(7)
STUB_M = _rng.randn(FEAT_DIM, 3).astype(np.float32)
STUB_B = _rng.randn(FEAT_DIM).astype(np.float32)
TEXT_FEATURES = _rng.randn(N_CLASSES, FEAT_DIM).astype(np.float32)
CLASS_LIST = [f"class_{i}" for i in range(N_CLASSES)]


def _stub_feats(mean_rgb_01: np.ndarray) -> np.ndarray:
    """The shared stub CLIP image feature: (N, 3) mean RGB in [0,1] ->
    (N, FEAT_DIM).  Injective in the stripe colors, so label decisions are
    fully determined by WHICH pixels each side cropped."""
    return mean_rgb_01 @ STUB_M.T + STUB_B


def _load_reference_tools():
    """Import /root/reference/tools/utils.py with its viewer-only deps
    stubbed (rerun/open3d/torchvision are not installed here; none of them
    touch the label chain under test)."""
    class _Noop:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    for name, attrs in (
        ("rerun", {}),
        ("rerun.blueprint", {}),
        ("open3d", {}),
        ("torchvision", {}),
        (
            "torchvision.transforms",
            {"Compose": lambda fns: _Noop(), "Normalize": _Noop},
        ),
        ("torchvision.transforms.functional", {"pil_to_tensor": lambda x: x}),
    ):
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules[name] = mod
    sys.modules["rerun"].blueprint = sys.modules["rerun.blueprint"]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision.transforms"].functional = sys.modules[
        "torchvision.transforms.functional"
    ]
    if REF not in sys.path:
        sys.path.insert(0, REF)
    spec = importlib.util.spec_from_file_location(
        "ref_tools_utils", os.path.join(REF, "tools", "utils.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class _RefStubCLIP:
    """The SAMCLIP image-feature contract (tools/utils.py:395-397)."""

    def get_batch_images_clip_features(self, images):
        import torch

        arr = np.stack(
            [np.asarray(im, np.float32).mean(axis=(0, 1)) for im in images]
        )  # (N, 3) mean RGB in 0..255 (zero-size crops arrive as zeros images)
        feats = _stub_feats(arr / 255.0)
        return torch.tensor(feats, dtype=torch.float32), None


class _StubTower:
    """Drop-in for models/clip/model.py::CLIPImageTower in the labeler: maps
    CLIP-normalized crops back to 0..1 RGB and applies the same stub."""

    def apply(self, params, crops):
        import jax.numpy as jnp

        from boxfusion_tpu.models.clip.head import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

        x = crops * jnp.asarray(CLIP_IMAGE_STD) + jnp.asarray(CLIP_IMAGE_MEAN)
        c = jnp.mean(x, axis=(1, 2))  # (N, 3) in 0..1
        return c @ jnp.asarray(STUB_M).T + jnp.asarray(STUB_B)


def _stripe_frame():
    """(H, W, 3) uint8 of 4 solid vertical stripes + detections placed so
    every x1.5-scaled box stays >= 4 px inside one stripe (bilinear resize
    of a solid region is then exact on both stacks)."""
    colors = np.array(
        [[220, 40, 40], [40, 200, 60], [50, 60, 230], [240, 220, 30]], np.uint8
    )
    img = np.zeros((H, W, 3), np.uint8)
    for i, c in enumerate(colors):
        img[:, i * 32 : (i + 1) * 32] = c
    # xyxy, centered in stripes 0..3; widths 16 -> scaled 24 (4 px margin)
    boxes = np.array(
        [
            [8.0, 20.0, 24.0, 52.0],   # stripe 0
            [40.0, 30.0, 56.0, 62.0],  # stripe 1
            [72.0, 10.0, 88.0, 42.0],  # stripe 2
            [104.0, 40.0, 120.0, 72.0],  # stripe 3
            [64.0, 40.0, 64.0, 60.0],  # zero width -> black-crop path
            [40.0, 60.0, 56.0, 90.0],  # stripe 1, below the raw threshold
        ],
        np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6, 0.5, 0.3], np.float32)  # sorted desc
    return img, boxes, scores


def _pick_sim_thres(ref_utils, img, boxes):
    """A background threshold that splits the boxes with a wide margin, so
    the argmax-vs-background decision cannot flip on float noise."""
    import torch

    _, crops = ref_utils.crop_image(boxes, img)
    probs, _ = ref_utils.retriev(
        _RefStubCLIP(), None, crops, torch.tensor(TEXT_FEATURES), device="cpu"
    )
    best = probs.max(dim=-1).values.numpy()
    # stripes repeat across boxes -> duplicate sims; split between the two
    # lowest DISTINCT values so at least one row lands below
    lo, hi = np.unique(best)[:2]
    thres = float((lo + hi) / 2)
    assert min(abs(best - thres)) > 0.5, (best, thres)
    return thres


def _reference_labels(ref_utils, img, boxes, scores, sim_thres):
    """The demo's keyframe label stage (demo.py:138-171) verbatim: raw
    filter -> scale -> text_prompt -> boost -> background drop."""
    import torch

    keep_raw = scores >= RAW_THRESH
    boxes, scores = boxes[keep_raw], scores[keep_raw].copy()
    scaled = ref_utils.scale_boxes(boxes, H, W, scale=SCALE_BOX)
    cats, _, sims = ref_utils.text_prompt(
        scaled,
        np.asarray(CLASS_LIST),
        torch.tensor(TEXT_FEATURES),
        img,
        _RefStubCLIP(),
        None,
        sim_thres,
    )
    scores = scores + CLIP_COEFF * sims.numpy() / 100.0
    kept = cats != ""
    return (
        np.flatnonzero(keep_raw)[kept],  # original row indices kept
        cats[kept],
        scores[kept],
    )


def _ours_labels(img, boxes, scores, sim_thres):
    import jax.numpy as jnp

    from boxfusion_tpu.data.preprocess import PIXEL_MEAN_U8, PIXEL_STD_U8
    from boxfusion_tpu.models.clip.head import OpenVocabLabeler
    from boxfusion_tpu.runtime.fused import label_boost_core

    labeler = OpenVocabLabeler(CLASS_LIST, TEXT_FEATURES, sim_thres=sim_thres)
    labeler.tower = _StubTower()
    labeler.params = {}

    norm_image = (jnp.asarray(img, jnp.float32) - jnp.asarray(PIXEL_MEAN_U8)) / jnp.asarray(
        PIXEL_STD_U8
    )
    det = {"scores": jnp.asarray(scores), "pred_boxes": jnp.asarray(boxes)}
    det, overflow = label_boost_core(
        labeler,
        det,
        norm_image,
        jnp.asarray([H, W], jnp.float32),
        label_budget=8,
        scale_box=SCALE_BOX,
        clip_coeff=CLIP_COEFF,
        raw_score_thresh=RAW_THRESH,
        clip_params=labeler.params,
        text_features=jnp.asarray(labeler.text_features),
    )
    assert int(overflow) == 0
    new_scores = np.asarray(det["scores"])
    cat_idx = np.asarray(det["category"])
    kept = new_scores > -1e8
    class_arr = np.asarray(CLASS_LIST + [""])
    return np.flatnonzero(kept), class_arr[cat_idx[kept]], new_scores[kept]


def test_label_stage_decision_parity():
    ref_utils = _load_reference_tools()
    img, boxes, scores = _stripe_frame()
    sim_thres = _pick_sim_thres(
        ref_utils, img, ref_utils.scale_boxes(boxes, H, W, scale=SCALE_BOX)
    )

    ref_idx, ref_cats, ref_scores = _reference_labels(
        ref_utils, img, boxes, scores, sim_thres
    )
    our_idx, our_cats, our_scores = _ours_labels(img, boxes, scores, sim_thres)

    # the raw-score filter dropped row 5 on both sides, the background drop
    # removed exactly one more row, and the zero-width box survived via the
    # black-crop fallback on both sides (or was background on both)
    np.testing.assert_array_equal(ref_idx, our_idx)
    np.testing.assert_array_equal(ref_cats, our_cats)
    np.testing.assert_allclose(ref_scores, our_scores, atol=1e-5)
    # case coverage: the scenario must actually exercise the branches
    assert len(ref_idx) >= 3  # several kept
    assert len(ref_idx) < np.sum(scores >= RAW_THRESH)  # >=1 background drop
    assert 5 not in ref_idx  # raw filter fired


def test_label_parity_zero_coeff_and_no_background():
    """clip_sim_coeff = 0 (ca1m.yaml has no boost) and a threshold below
    every similarity: labels only, nothing dropped, scores unchanged."""
    ref_utils = _load_reference_tools()
    img, boxes, scores = _stripe_frame()

    ref_idx, ref_cats, ref_scores = _reference_labels(
        ref_utils, img, boxes, scores, sim_thres=-1e5
    )
    our_idx, our_cats, our_scores = _ours_labels(img, boxes, scores, sim_thres=-1e5)
    np.testing.assert_array_equal(ref_idx, our_idx)
    np.testing.assert_array_equal(ref_cats, our_cats)
    np.testing.assert_allclose(ref_scores, our_scores, atol=1e-5)
    assert list(ref_idx) == [0, 1, 2, 3, 4]  # nothing background-dropped

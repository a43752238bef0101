"""DepthBoxes yaw-box API: golden parity against the reference class.

Every operation is compared numerically against the reference's
``DepthInstance3DBoxes`` (boxes.py:512-654 + BaseInstance3DBoxes surface)
running in-process on the same random boxes.
"""
import os

import numpy as np
import pytest

from boxfusion_tpu.structures.boxes3d import DepthBoxes

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


@pytest.fixture(scope="module")
def ref_cls():
    from tests.test_reference_parity import _install_reference

    _install_reference()
    from boxfusion.boxes import DepthInstance3DBoxes

    return DepthInstance3DBoxes


def _rand_boxes(n=7, seed=0):
    rng = np.random.RandomState(seed)
    t = np.concatenate(
        [
            rng.uniform(-2, 2, (n, 3)),
            rng.uniform(0.2, 1.5, (n, 3)),
            rng.uniform(-np.pi, np.pi, (n, 1)),
        ],
        axis=1,
    ).astype(np.float32)
    return t


def _cmp(ours: DepthBoxes, ref, atol=1e-5):
    np.testing.assert_allclose(
        np.asarray(ours.tensor), ref.tensor.numpy(), atol=atol
    )


def test_properties_match(ref_cls):
    t = _rand_boxes()
    ours, ref = DepthBoxes(t), ref_cls(t)
    np.testing.assert_allclose(np.asarray(ours.corners), ref.corners.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.gravity_center), ref.gravity_center.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.bottom_center), ref.bottom_center.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.volume), ref.volume.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours.top_height), ref.top_height.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.height), ref.height.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.yaw), ref.yaw.numpy(), atol=1e-6)


def test_origin_normalization(ref_cls):
    t = _rand_boxes(seed=1)
    ours = DepthBoxes(t, origin=(0.5, 0.5, 0.5))
    ref = ref_cls(t, origin=(0.5, 0.5, 0.5))
    _cmp(ours, ref)


def test_six_wide_fake_yaw(ref_cls):
    t = _rand_boxes(seed=2)[:, :6]
    ours = DepthBoxes(t)
    ref = ref_cls(t, box_dim=6)
    assert ours.with_yaw is False and ref.with_yaw is False
    _cmp(ours, ref)


def test_rotate_scalar_matches(ref_cls):
    t = _rand_boxes(seed=3)
    ours = DepthBoxes(t).rotate(0.7)
    ref = ref_cls(t).rotate(0.7)
    _cmp(ours, ref, atol=1e-5)


def test_rotate_matrix_matches(ref_cls):
    t = _rand_boxes(seed=4)
    a = 0.45
    m = np.array(
        [[np.cos(a), np.sin(a), 0], [-np.sin(a), np.cos(a), 0], [0, 0, 1]],
        np.float32,
    )
    ours = DepthBoxes(t).rotate(m)
    import torch

    ref = ref_cls(t).rotate(torch.tensor(m))
    _cmp(ours, ref, atol=1e-5)


def test_rotate_no_yaw_aabb_refit(ref_cls):
    t = _rand_boxes(seed=5)[:, :6]
    ours = DepthBoxes(t).rotate(0.6)
    ref = ref_cls(t, box_dim=6).rotate(0.6)
    _cmp(ours, ref, atol=1e-4)


def test_translate_scale_flip_enlarge(ref_cls):
    t = _rand_boxes(seed=6)
    v = np.array([0.3, -0.2, 0.5], np.float32)

    _cmp(DepthBoxes(t).translate(v), ref_cls(t).translate(v))

    ref = ref_cls(t)
    ref.scale(1.7)
    _cmp(DepthBoxes(t).scale(1.7), ref)

    for d in ("horizontal", "vertical"):
        ref = ref_cls(t)
        ref.flip(d)
        _cmp(DepthBoxes(t).flip(d), ref)

    _cmp(DepthBoxes(t).enlarged_box(0.12), ref_cls(t).enlarged_box(0.12))


def test_predicates_and_container(ref_cls):
    t = _rand_boxes(12, seed=7)
    ours, ref = DepthBoxes(t), ref_cls(t)

    rng = [-1, -1, -1, 1, 1, 1]
    np.testing.assert_array_equal(
        np.asarray(ours.in_range_3d(rng)), ref.in_range_3d(rng).numpy()
    )
    np.testing.assert_array_equal(
        np.asarray(ours.nonempty(0.5)), ref.nonempty(0.5).numpy()
    )

    _cmp(ours[3], ref[3])
    _cmp(ours[2:7], ref[2:7])
    mask = np.zeros(12, bool)
    mask[[1, 4, 9]] = True
    import torch

    _cmp(ours[mask], ref[torch.tensor(mask)])

    both = DepthBoxes.cat([ours[:4], ours[4:]])
    np.testing.assert_allclose(np.asarray(both.tensor), t, atol=1e-6)
    assert len(both) == 12

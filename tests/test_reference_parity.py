"""Activation parity: the flax CuTR vs the reference torch model.

Imports the reference implementation from /root/reference (read-only),
stubbing its two unavailable third-party imports (timm.layers.Mlp and
torchvision.transforms, neither of which affects the compute path), builds
it with random weights, converts the state dict with
models/cutr/convert.py, runs BOTH stacks end to end on the same frame --
reference Augmentor/Preprocessor/model vs our Preprocessor/model -- and
compares detections numerically.

Skipped when the reference tree is not mounted.
"""
import importlib.machinery
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")


def _install_reference(monkeypatch=None):
    import torch
    import torch.nn as nn

    class Mlp(nn.Module):
        def __init__(self, in_features, hidden_features, act_layer=nn.GELU, bias=True):
            super().__init__()
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.fc2 = nn.Linear(hidden_features, in_features, bias=bias)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    timm = types.ModuleType("timm")
    layers = types.ModuleType("timm.layers")
    layers.Mlp = Mlp
    timm.layers = layers
    # Real ModuleSpecs: transformers' optional-dependency probe walks
    # sys.modules and raises ``ValueError: <mod>.__spec__ is None`` on bare
    # ModuleType stubs, which made the suite order-dependent (any test
    # importing transformers AFTER _install_reference failed).
    timm.__spec__ = importlib.machinery.ModuleSpec("timm", loader=None)
    layers.__spec__ = importlib.machinery.ModuleSpec("timm.layers", loader=None)
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.layers", layers)

    class _Noop:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvt.Compose = lambda fns: _Noop()
    tvt.Normalize = _Noop
    tv.transforms = tvt
    tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", loader=None)
    tvt.__spec__ = importlib.machinery.ModuleSpec(
        "torchvision.transforms", loader=None
    )
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.transforms", tvt)

    if REF not in sys.path:
        sys.path.insert(0, REF)


def _sanitize_reference_init(ref_model):
    """Overwrite the reference's UNINITIALIZED ``level_embed`` parameter.

    cubify_transformer.py:1135 builds it from ``torch.Tensor(...)`` --
    uninitialized memory -- and never initializes it.  Harmless with a real
    checkpoint (loading overwrites it) but in these random-construction
    parity tests the garbage bytes occasionally decode to NaN/huge floats,
    which poisons BOTH models identically (we convert the same state dict)
    and made this suite flake with all-NaN outputs.  Deterministic fill so
    every trial sees the same finite values."""
    import torch

    with torch.no_grad():
        emb = ref_model.level_embed
        g = torch.Generator().manual_seed(42)
        emb.copy_(torch.randn(emb.shape, generator=g) * 0.02)


@pytest.fixture(scope="module")
def parity_setup():
    _install_reference()
    import torch

    from boxfusion.cubify_transformer import make_cubify_transformer
    from boxfusion.measurement import DepthMeasurementInfo, ImageMeasurementInfo
    from boxfusion.preprocessor import Augmentor, Preprocessor as RefPreprocessor
    from boxfusion.sensor import PosedSensorInfo, SensorArrayInfo

    torch.manual_seed(0)
    ref_model = make_cubify_transformer(dimension=192, depth_model=True).eval()
    _sanitize_reference_init(ref_model)

    # one upright frame (H=192, W=256 -> square pad 256, rgb:depth ratio 1)
    H, W = 192, 256
    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (H, W, 3), np.uint8)
    depth = (rng.rand(H, W) * 3.0 + 0.3).astype(np.float32)
    depth[rng.rand(H, W) < 0.05] = 0.0  # invalid holes
    K = np.array([[210.0, 0, W / 2 - 3], [0, 210.0, H / 2 + 2], [0, 0, 1]], np.float32)
    T_gravity = np.array(
        [[0.9962, 0.0, 0.0872], [0.0, 1.0, 0.0], [-0.0872, 0.0, 0.9962]], np.float32
    )
    pose = np.eye(4, dtype=np.float32)

    wide = PosedSensorInfo()
    wide.image = ImageMeasurementInfo(size=(W, H), K=torch.tensor(K)[None])
    wide.depth = DepthMeasurementInfo(size=(W, H), K=torch.tensor(K)[None])
    wide.RT = torch.eye(4)[None]
    wide.T_gravity = torch.tensor(T_gravity)[None]
    gt = PosedSensorInfo()
    gt.RT = torch.tensor(pose)[None]
    gt.depth = wide.depth

    sensor_info = SensorArrayInfo()
    sensor_info.wide = wide
    sensor_info.gt = gt

    sample = {
        "wide": {
            "image": torch.tensor(np.moveaxis(image, -1, 0))[None],
            "depth": torch.tensor(depth)[None],
        },
        "sensor_info": sensor_info,
        "meta": {"video_id": "parity", "timestamp": 0},
    }

    packaged = Augmentor(("wide/image", "wide/depth")).package(sample)
    packaged = RefPreprocessor().preprocess([packaged])
    with torch.no_grad():
        ref_out = ref_model(packaged)[0]

    return dict(
        ref_model=ref_model,
        ref_out=ref_out,
        image=image,
        depth=depth,
        K=K,
        T_gravity=T_gravity,
    )


def _assert_detection_set_parity(got, want, atols):
    """Order-free parity between two top-k detection sets.

    Top-k ORDER is implementation-defined here twice over: torch.topk vs
    lax.top_k break ties differently, and with random weights the query
    scores are so close that cross-implementation float noise (within the
    score tolerance) can legitimately reorder neighbours.  Rank-aligned
    row comparison is therefore flaky; instead require a perfect 1-1
    matching between the two sets with every field of every matched pair
    within its tolerance.

    ``got``/``want``: dicts field -> (N, ...) arrays, must contain
    "scores"; ``atols``: field -> atol.  Integer fields (e.g.
    "pred_classes") use atol 0 (exact).

    One verified escape hatch: near the top-k SCORE BOUNDARY the two
    implementations can keep DIFFERENT queries outright (the k-th and
    (k+1)-th scores tie within cross-implementation float noise, which
    itself varies with the host's thread count -- the flake only ever
    reproduced under a fully loaded suite).  No tolerance can match a row
    that is missing from the other set, so unmatched rows are excused iff
    BOTH sides of the pair sit within a small band of the k-th score --
    anything unmatched above the band is a real divergence and still fails.
    """
    from scipy.optimize import linear_sum_assignment

    n = len(want["scores"])
    assert len(got["scores"]) == n
    # Feasibility first: a pair is matchable iff EVERY field is within its
    # atol.  (A min-total-cost assignment alone could prefer an infeasible
    # matching whose summed distances are lower than a feasible one's.)
    feasible = np.ones((n, n), bool)
    dist = np.zeros((n, n))
    for k, atol in atols.items():
        g = np.asarray(got[k], np.float64).reshape(n, -1)
        w = np.asarray(want[k], np.float64).reshape(n, -1)
        d = np.abs(g[:, None] - w[None]).max(-1)
        feasible &= d <= atol
        dist += d / atol if atol > 0 else d
    # prefer feasible pairs (tie-broken by distance); a perfect feasible
    # matching exists iff the optimal assignment uses no 1e6 edges.
    rows, cols = linear_sum_assignment(np.where(feasible, dist, 1e6))
    bad = ~feasible[rows, cols]
    if bad.any():
        # excuse ONLY top-k boundary swaps: both members of the unmatched
        # pair score within `band` of the k-th (lowest) kept score, and at
        # most a handful of rows are involved
        gs = np.asarray(got["scores"], np.float64)
        ws = np.asarray(want["scores"], np.float64)
        band = 4.0 * atols["scores"]
        kth = ws.min()
        boundary = (gs[rows[bad]] <= kth + band) & (ws[cols[bad]] <= kth + band)
        # ...and each excused got-row must still RESEMBLE some want row
        # (every field within a loosened 8x band against its best partner):
        # a swap at the top-k boundary trades near-identical rows, whereas a
        # systematic divergence produces rows unlike anything on the other
        # side -- which must keep failing even inside the score band.
        resembles = np.ones(int(bad.sum()), bool)
        for bi, r in enumerate(rows[bad]):
            ok_any = np.ones(n, bool)
            for k, atol in atols.items():
                g = np.asarray(got[k], np.float64).reshape(n, -1)
                w = np.asarray(want[k], np.float64).reshape(n, -1)
                ok_any &= np.abs(g[r][None] - w).max(-1) <= 8.0 * atol
            resembles[bi] = ok_any.any()
        if boundary.all() and resembles.all() and bad.sum() <= max(2, n // 16):
            return
        # dump enough detail that a CI failure is diagnosable without a
        # rerun: for each unmatched got-row, the per-field distance to its
        # best feasible-ish partner
        lines = []
        for r, c in zip(rows[bad][:5], cols[bad][:5]):
            per_field = {
                k: float(
                    np.abs(
                        np.asarray(got[k], np.float64).reshape(n, -1)[r]
                        - np.asarray(want[k], np.float64).reshape(n, -1)[c]
                    ).max()
                )
                for k in atols
            }
            worst = {k: f"{v:.2e}/{atols[k]:g}" for k, v in per_field.items()}
            lines.append(f"  got[{r}] vs want[{c}]: {worst}")
        raise AssertionError(
            f"{bad.sum()}/{n} detections have no within-tolerance "
            "counterpart (abs-diff/atol per field, assigned pairs):\n"
            + "\n".join(lines)
        )


def test_activation_parity_end_to_end(parity_setup):
    import jax
    import jax.numpy as jnp

    from boxfusion_tpu.data.preprocess import Preprocessor
    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.models.cutr.convert import convert_cutr_checkpoint

    s = parity_setup
    sd = {k: v for k, v in s["ref_model"].state_dict().items()}
    params, dim, depth_model = convert_cutr_checkpoint(sd)
    assert dim == 192 and depth_model

    model = make_cutr(dimension=192, depth_model=True)
    batch, square, ratio = Preprocessor()(s["image"], s["depth"], s["K"], s["T_gravity"])
    assert (square, ratio) == (256, 1)
    out = jax.jit(model.apply)(params, batch)

    ref = s["ref_out"]
    got_scores = np.asarray(out["scores"][0])
    want_scores = ref.scores.numpy()
    np.testing.assert_allclose(got_scores, want_scores, atol=2e-3)

    _assert_detection_set_parity(
        got=dict(
            scores=got_scores,
            pred_boxes=np.asarray(out["pred_boxes"][0]),
            boxes3d=np.asarray(out["boxes3d"][0]),
            R=np.asarray(out["R"][0]),
            proj_xy=np.asarray(out["proj_xy"][0]),
            pred_classes=np.asarray(out["pred_classes"][0]),
        ),
        want=dict(
            scores=want_scores,
            pred_boxes=ref.pred_boxes.numpy(),
            boxes3d=ref.pred_boxes_3d.tensor.numpy(),
            R=ref.pred_boxes_3d.R.numpy(),
            proj_xy=ref.pred_proj_xy.numpy(),
            pred_classes=ref.pred_classes.numpy(),
        ),
        atols=dict(
            scores=2e-3,          # sigmoid probabilities
            pred_boxes=0.5,       # pixels
            boxes3d=5e-3,         # metres
            R=2e-3,
            proj_xy=0.5,          # pixels
            pred_classes=0,       # exact
        ),
    )


def test_activation_parity_ratio2_depth_window():
    """rgb:depth ratio 2 -> depth window 8 joint attention path."""
    _install_reference()
    import torch

    from boxfusion.cubify_transformer import make_cubify_transformer
    from boxfusion.measurement import DepthMeasurementInfo, ImageMeasurementInfo
    from boxfusion.preprocessor import Augmentor, Preprocessor as RefPreprocessor
    from boxfusion.sensor import PosedSensorInfo, SensorArrayInfo

    torch.manual_seed(1)
    ref_model = make_cubify_transformer(dimension=192, depth_model=True).eval()
    _sanitize_reference_init(ref_model)

    H, W = 160, 224
    rng = np.random.RandomState(1)
    image = rng.randint(0, 255, (H, W, 3), np.uint8)
    depth = (rng.rand(H // 2, W // 2) * 4.0 + 0.2).astype(np.float32)
    K = np.array([[180.0, 0, W / 2], [0, 180.0, H / 2], [0, 0, 1]], np.float32)
    Kd = K.copy()
    Kd[:2] /= 2

    wide = PosedSensorInfo()
    wide.image = ImageMeasurementInfo(size=(W, H), K=torch.tensor(K)[None])
    wide.depth = DepthMeasurementInfo(size=(W // 2, H // 2), K=torch.tensor(Kd)[None])
    wide.RT = torch.eye(4)[None]
    wide.T_gravity = torch.eye(3)[None]
    gt = PosedSensorInfo()
    gt.RT = torch.eye(4)[None]
    gt.depth = wide.depth
    si = SensorArrayInfo()
    si.wide = wide
    si.gt = gt
    sample = {
        "wide": {
            "image": torch.tensor(np.moveaxis(image, -1, 0))[None],
            "depth": torch.tensor(depth)[None],
        },
        "sensor_info": si,
        "meta": {},
    }
    packaged = Augmentor(("wide/image", "wide/depth")).package(sample)
    packaged = RefPreprocessor().preprocess([packaged])
    with torch.no_grad():
        ref = ref_model(packaged)[0]

    import jax

    from boxfusion_tpu.data.preprocess import Preprocessor
    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.models.cutr.convert import convert_cutr_checkpoint

    params, _, _ = convert_cutr_checkpoint(ref_model.state_dict())
    model = make_cutr(dimension=192, depth_model=True)
    batch, square, ratio = Preprocessor()(image, depth, K, np.eye(3, dtype=np.float32))
    assert (square, ratio) == (256, 2)
    out = jax.jit(model.apply)(params, batch)

    want_scores = ref.scores.numpy()
    np.testing.assert_allclose(np.asarray(out["scores"][0]), want_scores, atol=2e-3)
    _assert_detection_set_parity(
        got=dict(
            scores=np.asarray(out["scores"][0]),
            boxes3d=np.asarray(out["boxes3d"][0]),
        ),
        want=dict(
            scores=want_scores,
            boxes3d=ref.pred_boxes_3d.tensor.numpy(),
        ),
        atols=dict(scores=2e-3, boxes3d=5e-3),
    )

"""Visualization plumbing, driven against a fake rerun SDK.

rerun is not installed in CI; these tests install a minimal stand-in that
records every call, then assert the reference's viewer behavior: the 3-pane
Blueprint layout (demo.py:35-65), per-frame camera/image/depth/trajectory
logging (demo.py:174-197), the GT point-cloud backprojection
(demo.py:121-127), and fused-box logging (tools/utils.py:37-96).
"""
import sys
import types

import numpy as np
import pytest


class _Record:
    def __init__(self, kind, *a, **k):
        self.kind = kind
        self.args = a
        self.kwargs = k


def _make_fake_rerun():
    calls = []

    rr = types.ModuleType("rerun")

    class _Recording:
        def __init__(self):
            self.blueprints = []

        def send_blueprint(self, bp, make_active=False):
            self.blueprints.append(bp)

    def _entity(kind):
        def make(*a, **k):
            return _Record(kind, *a, **k)

        return make

    rr.new_recording = lambda **k: _Recording()
    rr.spawn = lambda: None
    rr.log = lambda path, entity, **k: calls.append((path, entity))
    rr.set_time_seconds = lambda name, t, **k: calls.append(("__time__", t))
    for kind in (
        "Transform3D", "Quaternion", "Pinhole", "DepthImage",
        "LineStrips3D", "Points3D", "Boxes3D",
    ):
        setattr(rr, kind, _entity(kind))

    class _Image(_Record):
        def __init__(self, *a, **k):
            super().__init__("Image", *a, **k)

        def compress(self):
            return self

    rr.Image = _Image

    rrb = types.ModuleType("rerun.blueprint")

    class _BP(_Record):
        pass

    for kind in ("Blueprint", "Vertical", "Horizontal", "Spatial3DView", "Spatial2DView"):
        setattr(rrb, kind, lambda *a, _kind=kind, **k: _BP(_kind, *a, **k))
    rr.blueprint = rrb
    return rr, rrb, calls


@pytest.fixture()
def fake_rerun(monkeypatch):
    rr, rrb, calls = _make_fake_rerun()
    monkeypatch.setitem(sys.modules, "rerun", rr)
    monkeypatch.setitem(sys.modules, "rerun.blueprint", rrb)
    from boxfusion_tpu.utils import viz

    monkeypatch.setattr(viz, "rerun", rr)
    monkeypatch.setattr(viz, "HAS_RERUN", True)
    return viz, calls


def _frame():
    from boxfusion_tpu.data.synthetic import SyntheticSequence

    return next(iter(SyntheticSequence(n_frames=1, n_boxes=3, seed=0)))


def test_blueprint_layout(fake_rerun):
    viz, _ = fake_rerun
    bp = viz.make_blueprint(is_depth_model=True)
    assert bp.kind == "Blueprint"
    vertical = bp.args[0]
    top, bottom = vertical.kwargs["contents"]
    world = top.kwargs["contents"][0]
    assert world.kwargs["name"] == "World"
    assert world.kwargs["origin"] == "/world"
    assert "+ /device/wide/pred_instances/**" in world.kwargs["contents"]
    panes = bottom.kwargs["contents"]
    assert [p.kwargs["name"] for p in panes] == ["Image", "Depth"]

    # RGB-only drops the depth pane (reference demo.py:60-63)
    bp2 = viz.make_blueprint(is_depth_model=False)
    bottom2 = bp2.args[0].kwargs["contents"][1]
    assert [p.kwargs["name"] for p in bottom2.kwargs["contents"]] == ["Image"]


def test_init_recording_sends_blueprint(fake_rerun):
    viz, _ = fake_rerun
    rec = viz.init_recording("vid0")
    assert len(rec.blueprints) == 1
    assert rec.blueprints[0].kind == "Blueprint"


def test_log_frame_paths(fake_rerun):
    viz, calls = fake_rerun
    f = _frame()
    viz.log_frame(f, f.gt_pose)
    viz.log_frame(f, f.gt_pose)  # second frame -> trajectory polyline
    paths = [c[0] for c in calls]
    assert "/device/wide/image" in paths
    assert "/device/wide/depth" in paths
    assert "/device/trajectory" in paths
    assert ("__time__", 0.0) in calls


def test_gt_point_cloud_geometry(fake_rerun):
    """Backprojected points must land at depth*ray in world coordinates."""
    viz, calls = fake_rerun
    f = _frame()
    viz.log_gt_point_cloud(f, max_depth=10.0)
    entries = [c for c in calls if c[0] == "/world/xyz"]
    assert len(entries) == 1
    pts = entries[0][1].kwargs["positions"]
    cols = entries[0][1].kwargs["colors"]
    assert pts.shape[1] == 3 and len(pts) == len(cols)
    assert len(pts) > 0

    # closed-form check on the principal point: pixel (cx, cy) backprojects
    # straight down the optical axis to pose @ [0, 0, z]
    cx, cy = int(f.K_depth[0, 2]), int(f.K_depth[1, 2])
    z = float(f.depth[cy, cx])
    expect = f.gt_pose[:3, :3] @ np.array([0.0, 0.0, z]) + f.gt_pose[:3, 3]
    d = np.linalg.norm(pts - expect[None], axis=1).min()
    assert d < 5e-2, d


def test_visualize_online_boxes(fake_rerun):
    viz, calls = fake_rerun

    class W:
        arrays = {
            "xyzlhw": np.array([[0, 0, 0, 1, 1, 1], [1, 1, 1, 0.5, 0.5, 0.5]], np.float32),
            "R": np.tile(np.eye(3, dtype=np.float32), (2, 1, 1)),
        }
        categories = ["chair", "table"]

        def __len__(self):
            return 2

    viz.visualize_online_boxes(W(), show_class=True)
    entries = [c for c in calls if c[0].endswith("pred_instances")]
    assert len(entries) == 1
    assert entries[0][1].kwargs["labels"] == ["chair", "table"]


def test_visualize_online_boxes_empty_and_dict_worlds(fake_rerun):
    """An empty host WorldState has arrays == {} -- emptiness must be
    checked BEFORE indexing arrays (crashed when no detection survived the
    first keyframe's filters).  Device-export dicts work too."""
    viz, calls = fake_rerun

    class EmptyW:
        arrays = {}
        categories = []

        def __len__(self):
            return 0

    viz.visualize_online_boxes(EmptyW())  # must not raise

    empty_dict = {
        "scores": np.zeros((0,), np.float32),
        "xyzlhw": np.zeros((0, 6), np.float32),
        "R": np.zeros((0, 3, 3), np.float32),
    }
    viz.visualize_online_boxes(empty_dict)  # must not raise
    assert not [c for c in calls if c[0].endswith("pred_instances")]

    world = {
        "scores": np.array([0.9], np.float32),
        "xyzlhw": np.array([[0, 0, 0, 1, 1, 1]], np.float32),
        "R": np.eye(3, dtype=np.float32)[None],
        "categories": ["sofa"],
    }
    viz.visualize_online_boxes(world, show_class=True)
    entries = [c for c in calls if c[0].endswith("pred_instances")]
    assert len(entries) == 1
    assert entries[0][1].kwargs["labels"] == ["sofa"]

"""Tests for the 3D AP evaluator and multi-sequence fan-out."""
import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.eval import average_precision_3d, evaluate_sequences, match_detections
from boxfusion_tpu.geometry.boxes import box_corners


def _corners(t, R=None):
    t = jnp.asarray(t, jnp.float32)
    R = jnp.tile(jnp.eye(3)[None], (t.shape[0], 1, 1)) if R is None else jnp.asarray(R)
    return np.asarray(box_corners(t, R))


def test_match_detections_perfect():
    gt = _corners([[0, 0, 0, 1, 1, 1], [3, 0, 0, 1, 1, 1]])
    tp, n_gt = match_detections(gt, np.array([0.9, 0.8]), gt, 0.25)
    assert n_gt == 2 and tp.all()


def test_match_no_double_counting():
    gt = _corners([[0, 0, 0, 1, 1, 1]])
    pred = _corners([[0, 0, 0, 1, 1, 1], [0.02, 0, 0, 1, 1, 1]])
    tp, _ = match_detections(pred, np.array([0.9, 0.8]), gt, 0.25)
    assert tp[0] and not tp[1]  # second overlapping det is a FP


def test_ap_perfect_and_degraded():
    gt = _corners([[0, 0, 0, 1, 1, 1], [3, 0, 0, 1, 1, 1], [0, 3, 0, 1, 1, 1]])
    perfect = [dict(pred_corners=gt, pred_scores=np.array([0.9, 0.8, 0.7]), gt_corners=gt)]
    m = average_precision_3d(perfect, 0.25)
    assert m["ap"] > 0.99 and m["recall"] == 1.0

    # one miss + one false positive
    fp = _corners([[10, 10, 10, 1, 1, 1]])
    degraded = [
        dict(
            pred_corners=np.concatenate([gt[:2], fp]),
            pred_scores=np.array([0.9, 0.8, 0.95]),
            gt_corners=gt,
        )
    ]
    m2 = average_precision_3d(degraded, 0.25)
    assert m2["ap"] < m["ap"]
    assert abs(m2["recall"] - 2 / 3) < 1e-6


def test_evaluate_sequences_fanout(tmp_path):
    from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config("config/ca1m.yaml")
    cfg["data"]._data["gap"] = 5
    cfg["detection"]._data["score_thresh"] = 0.3
    cfg["detection"]._data["uv_bound"] = False
    cfg["detection"]._data["floor_mask"] = False
    cfg["detection"]._data["max_detections"] = 16
    cfg["box_fusion"]._data["pst_path"] = None
    cfg["box_fusion"]._data["pst_size"] = 128
    cfg["box_fusion"]._data["iters"] = 4
    cfg["box_fusion"]._data["max_fusions_per_frame"] = 4
    cfg["association"]._data["max_views"] = 5

    seqs = [
        SyntheticSequence(n_frames=15, n_boxes=3, seed=s, video_id=f"synth{s}")
        for s in (0, 1, 2, 3, 4)
    ]

    def gt_provider(seq):
        return _corners(seq.gt_xyzlhw, seq.gt_R)

    out = evaluate_sequences(
        cfg,
        seqs,
        detector_factory=lambda s: OracleDetector(s, noise=0.0),
        gt_provider=gt_provider,
        output_dir=str(tmp_path),
        capacity=64,
    )
    assert len(out["sequences"]) == 5
    assert out["ap_0.25"]["ap"] > 0.99, out["ap_0.25"]
    assert (tmp_path / "synth0_boxes.pkl").exists()

    # resume: second call skips both
    out2 = evaluate_sequences(
        cfg, seqs, lambda s: OracleDetector(s), output_dir=str(tmp_path), capacity=64
    )
    assert len(out2["sequences"]) == 0


def test_evaluate_sequences_fused_fanout(tmp_path):
    """fused=True routes the fan-out through FusedDevicePipeline (one
    program per keyframe) with per-device pinning on the virtual mesh."""
    import jax

    from boxfusion_tpu.data.preprocess import Preprocessor
    from boxfusion_tpu.data.synthetic import SyntheticSequence
    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.runtime.detector import CuTRDetector
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config("config/ca1m.yaml")
    cfg["data"]._data["gap"] = 5
    cfg["detection"]._data["score_thresh"] = 0.1
    cfg["detection"]._data["uv_bound"] = False
    cfg["detection"]._data["floor_mask"] = False
    cfg["detection"]._data["max_detections"] = 16
    cfg["box_fusion"]._data["pst_path"] = None
    cfg["box_fusion"]._data["pst_size"] = 128
    cfg["box_fusion"]._data["iters"] = 4
    cfg["box_fusion"]._data["max_fusions_per_frame"] = 4
    cfg["association"]._data["max_views"] = 5

    model = make_cutr(dimension=192, depth_model=True)
    seq0 = SyntheticSequence(n_frames=1, n_boxes=2, seed=0)
    f0 = next(iter(seq0))
    batch, _, _ = Preprocessor()(f0.image, f0.depth, f0.K, f0.T_gravity)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    seqs = [
        SyntheticSequence(n_frames=6, n_boxes=2, seed=s, video_id=f"fseq{s}")
        for s in (0, 1, 2)
    ]
    out = evaluate_sequences(
        cfg,
        seqs,
        detector_factory=lambda s: CuTRDetector(model, params),
        output_dir=str(tmp_path),
        capacity=32,
        fused=True,
    )
    assert len(out["sequences"]) == 3
    for s in (0, 1, 2):
        assert (tmp_path / f"fseq{s}_boxes.pkl").exists()


def test_per_class_ap_and_map():
    from boxfusion_tpu.eval import average_precision_3d_per_class

    gt = _corners([[0, 0, 0, 1, 1, 1], [3, 0, 0, 1, 1, 1], [0, 3, 0, 1, 1, 1]])
    # predictions perfect for "chair" (2 GT), wrong class on the "table" GT
    seqs = [
        dict(
            pred_corners=gt,
            pred_scores=np.array([0.9, 0.8, 0.7]),
            pred_classes=np.array(["chair", "chair", "chair"]),
            gt_corners=gt,
            gt_classes=np.array(["chair", "chair", "table"]),
        )
    ]
    out = average_precision_3d_per_class(seqs, 0.25)
    assert out["per_class"]["chair"]["ap"] > 0.99
    # the table GT was predicted as chair: zero AP for table
    assert out["per_class"]["table"]["ap"] == 0.0
    assert 0.4 < out["map"] < 0.6  # mean of 1.0 and 0.0

    # class-agnostic AP would be perfect -- per-class is strictly stricter
    from boxfusion_tpu.eval import average_precision_3d

    agn = average_precision_3d(seqs, 0.25)
    assert agn["ap"] > 0.99 > out["map"]


def test_evaluate_sequences_batched_lanes(tmp_path):
    """--lanes mode: groups of N sequences run through one BatchedPipeline;
    an uneven tail group (5 sequences, lanes=2 -> 2/2/1) works."""
    import jax

    from boxfusion_tpu.data.preprocess import Preprocessor
    from boxfusion_tpu.data.synthetic import SyntheticSequence
    from boxfusion_tpu.eval import evaluate_sequences_batched
    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.runtime.detector import CuTRDetector
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config("config/ca1m.yaml")
    cfg["data"]._data["gap"] = 5
    cfg["detection"]._data["score_thresh"] = 0.1
    cfg["detection"]._data["uv_bound"] = False
    cfg["detection"]._data["floor_mask"] = False
    cfg["detection"]._data["max_detections"] = 16
    cfg["box_fusion"]._data["pst_path"] = None
    cfg["box_fusion"]._data["pst_size"] = 128
    cfg["box_fusion"]._data["iters"] = 4
    cfg["box_fusion"]._data["max_fusions_per_frame"] = 4
    cfg["association"]._data["max_views"] = 5

    model = make_cutr(dimension=192, depth_model=True)
    s0 = SyntheticSequence(n_frames=1, n_boxes=2, seed=0)
    f0 = next(iter(s0))
    batch, _, _ = Preprocessor()(f0.image, f0.depth, f0.K, f0.T_gravity)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    seqs = [
        SyntheticSequence(n_frames=6, n_boxes=2, seed=s, video_id=f"lane{s}")
        for s in range(5)
    ]
    out = evaluate_sequences_batched(
        cfg, seqs, detector=CuTRDetector(model, params), lanes=2,
        output_dir=str(tmp_path), capacity=32,
    )
    assert len(out["sequences"]) == 5
    for s in range(5):
        assert (tmp_path / f"lane{s}_boxes.pkl").exists()


def test_evaluate_sequences_batched_packed_with_labeler(tmp_path):
    """Labeled packed --lanes eval end to end: worlds carry open-vocab
    categories, pickles are written, per-lane fps recorded."""
    import jax

    from boxfusion_tpu.data.preprocess import Preprocessor
    from boxfusion_tpu.data.synthetic import SyntheticSequence
    from boxfusion_tpu.eval import evaluate_sequences_batched
    from boxfusion_tpu.models.clip.head import OpenVocabLabeler
    from boxfusion_tpu.models.clip.model import CLIPConfig
    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.runtime.detector import CuTRDetector
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config("config/ca1m.yaml")
    cfg["data"]._data["gap"] = 5
    cfg["detection"]._data["score_thresh"] = 0.1
    cfg["detection"]._data["uv_bound"] = False
    cfg["detection"]._data["floor_mask"] = False
    cfg["detection"]._data["max_detections"] = 16
    cfg["box_fusion"]._data["pst_path"] = None
    cfg["box_fusion"]._data["pst_size"] = 128
    cfg["box_fusion"]._data["iters"] = 4
    cfg["box_fusion"]._data["max_fusions_per_frame"] = 4
    cfg["association"]._data["max_views"] = 5

    model = make_cutr(dimension=192, depth_model=True)
    s0 = SyntheticSequence(n_frames=1, n_boxes=2, seed=0)
    f0 = next(iter(s0))
    batch, _, _ = Preprocessor()(f0.image, f0.depth, f0.K, f0.T_gravity)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)

    tiny = CLIPConfig(
        patch=32, width=64, layers=2, heads=2, embed_dim=32,
        vocab_size=64, context_length=8, text_width=64, text_layers=1,
        text_heads=2,
    )
    tf = np.random.RandomState(0).randn(3, 32).astype(np.float32)
    labeler = OpenVocabLabeler(
        ["chair", "table", "sofa"], tf, cfg=tiny, sim_thres=-1e9, max_boxes=16
    ).init_random(0)

    seqs = [
        SyntheticSequence(n_frames=6, n_boxes=2, seed=s, video_id=f"lab{s}")
        for s in range(3)
    ]
    out = evaluate_sequences_batched(
        cfg, seqs, detector=CuTRDetector(model, params), lanes=2,
        output_dir=str(tmp_path), capacity=32, packed=True, labeler=labeler,
    )
    assert len(out["sequences"]) == 3
    assert all(e["fps"] > 0 for e in out["sequences"])
    for s in range(3):
        assert (tmp_path / f"lab{s}_boxes.pkl").exists()


def test_eval_cli_real_gt_ap(tmp_path, capsys):
    """--gt on real-format data: raw capture -> SLAM dir with
    after_filter_boxes.npy -> eval CLI computes + prints 3D AP."""
    import yaml

    from tests.test_dataprocess import _write_capture

    from boxfusion_tpu.data_process import convert_capture_to_slam
    from boxfusion_tpu.eval.__main__ import main as eval_main

    cap = _write_capture(tmp_path, n_frames=11)
    slam = tmp_path / "slam" / "42898867"
    convert_capture_to_slam(str(cap), str(slam))
    # GT: two world boxes in front of the camera (corners as the GT filter
    # writes them, data_process/gt_filter.py::filter_gt_boxes)
    gt = np.stack([
        _corners([[0.0, 0.0, 1.5, 0.4, 0.4, 0.4]])[0],
        _corners([[0.5, 0.2, 2.0, 0.3, 0.3, 0.3]])[0],
    ])
    np.save(slam / "after_filter_boxes.npy", gt)

    with open("config/ca1m.yaml") as f:
        raw = yaml.safe_load(f)
    raw["data"]["gap"] = 5
    raw["detection"]["score_thresh"] = 0.3
    raw["detection"]["max_detections"] = 16
    raw["box_fusion"]["pst_path"] = None
    raw["box_fusion"]["pst_size"] = 128
    raw["box_fusion"]["iters"] = 4
    raw["box_fusion"]["max_fusions_per_frame"] = 4
    raw["cam"]["H"] = 64  # CA-1M convention: cam.H = width (landscape 48x64)
    raw["cam"]["W"] = 48
    raw["vis"]["rerun"] = False
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(raw))

    rc = eval_main([
        "--config", str(cfg_path), "--data-root", str(tmp_path / "slam"),
        "--dimension", "192", "--gt", "--capacity", "32",
        "--output-dir", str(tmp_path / "out"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "3D AP@0.25" in out
    assert (tmp_path / "out" / "42898867_boxes.pkl").exists()


def test_eval_cli_real_gt_missing_file_errors(tmp_path, capsys):
    """--gt with no after_filter_boxes.npy fails with a pointed error."""
    import yaml

    from tests.test_dataprocess import _write_capture

    from boxfusion_tpu.data_process import convert_capture_to_slam
    from boxfusion_tpu.eval.__main__ import main as eval_main

    cap = _write_capture(tmp_path, n_frames=6)
    slam = tmp_path / "slam" / "42898867"
    convert_capture_to_slam(str(cap), str(slam))

    with open("config/ca1m.yaml") as f:
        raw = yaml.safe_load(f)
    raw["box_fusion"]["pst_path"] = None
    raw["box_fusion"]["pst_size"] = 128
    raw["cam"]["H"] = 64
    raw["cam"]["W"] = 48
    raw["vis"]["rerun"] = False
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(raw))

    rc = eval_main([
        "--config", str(cfg_path), "--data-root", str(tmp_path / "slam"),
        "--dimension", "192", "--gt", "--capacity", "32",
    ])
    assert rc == 1  # clean stderr + exit code, not a traceback
    err = capsys.readouterr().err
    assert "filter-gt" in err


def test_summarize_adds_per_class_map_when_labeled():
    """_summarize computes per-class mAP when every entry carries classes."""
    from boxfusion_tpu.eval.runner import _summarize

    gt = _corners([[0, 0, 0, 1, 1, 1], [3, 0, 0, 1, 1, 1]])
    entry = dict(
        video_id="a", fps=1.0,
        pred_corners=gt, pred_scores=np.array([0.9, 0.8]),
        pred_classes=np.array(["chair", "table"]),
        gt_corners=gt, gt_classes=np.array(["chair", "table"]),
    )
    out = _summarize([entry], 1.0, gt_provider=lambda s: None)
    assert out["ap_0.25"]["ap"] > 0.99
    assert out["map_0.25"]["map"] > 0.99

    # one entry without classes -> class-agnostic only
    bare = {k: v for k, v in entry.items() if "classes" not in k}
    out2 = _summarize([bare], 1.0, gt_provider=lambda s: None)
    assert "map_0.25" not in out2 and "ap_0.25" in out2


def test_eval_cli_video_ids_subset_validation(tmp_path, capsys):
    """--video-ids with an unknown id fails fast before any model builds."""
    import yaml

    from tests.test_dataprocess import _write_capture

    from boxfusion_tpu.data_process import convert_capture_to_slam
    from boxfusion_tpu.eval.__main__ import main as eval_main

    cap = _write_capture(tmp_path, n_frames=3)
    slam = tmp_path / "slam" / "42898867"
    convert_capture_to_slam(str(cap), str(slam))
    with open("config/ca1m.yaml") as f:
        raw = yaml.safe_load(f)
    raw["vis"]["rerun"] = False
    cfg_path = tmp_path / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(raw))

    rc = eval_main([
        "--config", str(cfg_path), "--data-root", str(tmp_path / "slam"),
        "--video-ids", "nope",
    ])
    assert rc == 1
    assert "nope" in capsys.readouterr().err

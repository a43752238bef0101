"""Tests for offline data prep, readers, checkpointing."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from boxfusion_tpu.data_process import (
    classify_sequence_orientation,
    convert_capture_to_slam,
    filter_gt_boxes,
    read_ply_points,
)
from boxfusion_tpu.data_process.gt_filter import frustum_culling_mask, proximity_mask


def _write_capture(root, n_frames=3, hw=(48, 64)):
    """Synthesize a raw CA-1M capture directory."""
    cap = root / "42898867"
    h, w = hw
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        wide = cap / f"{i:06d}.wide"
        gt = cap / f"{i:06d}.gt"
        (gt / "image").mkdir(parents=True, exist_ok=True)
        (gt / "depth").mkdir(parents=True, exist_ok=True)
        wide.mkdir(parents=True, exist_ok=True)
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(wide / "image.png")
        Image.fromarray((rng.rand(h, w) * 3000).astype(np.uint16)).save(gt / "depth.png")
        pose = np.eye(4)
        pose[:3, 3] = [0.1 * i, 0, 0]
        (gt / "RT.json").write_text(json.dumps(pose.tolist()))
        (wide / "T_gravity.json").write_text(json.dumps(np.eye(3).tolist()))
        K = [[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]]
        (gt / "image" / "K.json").write_text(json.dumps(K))
        (gt / "depth" / "K.json").write_text(json.dumps(K))
    world = cap / "world.gt"
    world.mkdir(exist_ok=True)
    (world / "instances.json").write_text(
        json.dumps([{"corners": np.zeros((8, 3)).tolist()}])
    )
    return cap


def test_convert_capture_and_read(tmp_path):
    cap = _write_capture(tmp_path)
    out = tmp_path / "slam" / "42898867"
    stats = convert_capture_to_slam(str(cap), str(out))
    assert stats["frames"] == 3
    assert (out / "all_poses.npy").exists()
    assert (out / "K_depth.txt").exists()
    assert (out / "instances.json").exists()

    # the converted layout is readable by the CA-1M online reader
    from boxfusion_tpu.data.readers import CA1MDataset
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config("config/ca1m.yaml")
    cfg["data"]._data["datadir"] = str(out)
    # CA-1M convention: cam.H = image width (short), cam.W = image height
    # (capture_stream.py:359-360); this synthetic capture is landscape 48x64
    cfg["cam"]._data["H"] = 64
    cfg["cam"]._data["W"] = 48
    ds = CA1MDataset(cfg)
    frames = list(ds)
    assert len(frames) == 3
    f = frames[0]
    assert f.image.shape[2] == 3 and f.depth is not None
    assert f.K.shape == (3, 3) and f.gt_pose.shape == (4, 4)

    kind, v, h = classify_sequence_orientation(str(out))
    assert kind == "horizontal"


def test_scannet_reader(tmp_path):
    """Fake ScanNet frames dir: jpg color + 16-bit png depth + pose txts,
    including the inf-pose fallback (capture_stream.py:170-174)."""
    base = tmp_path / "scene0000_00" / "frames"
    for sub in ("color", "depth", "pose"):
        (base / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    h, w = 48, 64
    for i in range(3):
        Image.fromarray(rng.randint(0, 255, (h, w, 3), np.uint8)).save(
            base / "color" / f"{i}.jpg"
        )
        Image.fromarray((rng.rand(h, w) * 3000).astype(np.uint16)).save(
            base / "depth" / f"{i}.png"
        )
        pose = np.eye(4)
        pose[:3, 3] = [0.05 * i, 0, 0]
        if i == 1:
            pose[0, 0] = np.inf  # invalid pose -> falls back to previous
        np.savetxt(base / "pose" / f"{i}.txt", pose)

    from boxfusion_tpu.data.readers import ScannetDataset
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config("config/scannet.yaml")
    cfg["data"]._data["datadir"] = str(base)
    cfg["cam"]._data.update(dict(H=h, W=w, fx=50.0, fy=50.0, cx=w / 2, cy=h / 2))
    ds = ScannetDataset(cfg)
    frames = list(ds)
    assert len(frames) == 3
    assert ds.video_id == "scene0000_00"
    # inf pose fell back to frame 0's pose
    np.testing.assert_allclose(frames[1].gt_pose[:3, 3], frames[0].gt_pose[:3, 3])
    assert frames[0].image.shape == (h, w, 3)
    assert frames[0].depth.shape == (h, w)
    assert np.isfinite(frames[0].depth).all()


def test_prep_cli(tmp_path, capsys):
    """The data-prep subcommand tool (reference's standalone scripts) runs
    convert/classify/rotate/filter-gt end-to-end on a synthetic capture."""
    from boxfusion_tpu.data_process.__main__ import main

    cap = _write_capture(tmp_path)
    out = tmp_path / "slam" / "42898867"
    assert main(["convert", str(cap), str(out)]) == 0
    assert (out / "all_poses.npy").exists()

    assert main(["classify", str(out)]) == 0
    assert "horizontal" in capsys.readouterr().out

    assert main(["rotate", str(out)]) == 0
    assert "rotated" in capsys.readouterr().out

    # put one GT box in front of the camera so frustum culling keeps it
    corners = np.array(
        [
            [
                [x, y, z]
                for x in (-0.1, 0.1)
                for y in (-0.1, 0.1)
                for z in (0.9, 1.1)
            ]
        ],
        np.float32,
    )
    np.save(out / "gt_boxes.npy", corners)
    assert main(["filter-gt", str(out)]) == 0
    assert "1/1" in capsys.readouterr().out
    assert (out / "after_filter_boxes.npy").exists()


def test_ply_reader_roundtrip(tmp_path):
    pts = np.random.RandomState(0).randn(10, 3)
    ascii_ply = tmp_path / "a.ply"
    lines = ["ply", "format ascii 1.0", "element vertex 10",
             "property float x", "property float y", "property float z",
             "end_header"]
    lines += [" ".join(f"{v:.6f}" for v in p) for p in pts]
    ascii_ply.write_text("\n".join(lines) + "\n")
    got = read_ply_points(str(ascii_ply))
    np.testing.assert_allclose(got, pts, atol=1e-5)

    import struct

    bin_ply = tmp_path / "b.ply"
    with open(bin_ply, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\nelement vertex 10\n"
                b"property float x\nproperty float y\nproperty float z\nend_header\n")
        for p in pts:
            f.write(struct.pack("<fff", *p))
    got = read_ply_points(str(bin_ply))
    np.testing.assert_allclose(got, pts, atol=1e-5)


def test_gt_filter_frustum_and_proximity():
    from boxfusion_tpu.geometry.boxes import box_corners
    import jax.numpy as jnp

    # box in front of the camera and a box far behind
    t = jnp.asarray([[0, 0, 2.0, 0.5, 0.5, 0.5], [0, 0, -5.0, 0.5, 0.5, 0.5]])
    corners = np.asarray(box_corners(t, jnp.tile(jnp.eye(3)[None], (2, 1, 1))))
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]])
    poses = np.eye(4)[None]

    m = frustum_culling_mask(corners, K, poses, (64, 64))
    assert m[0] and not m[1]

    # proximity: points hugging box 0's corners
    pts = corners[0] + 0.01
    pm = proximity_mask(corners, pts, threshold=0.1)
    assert pm[0] and not pm[1]

    kept, no_labels = filter_gt_boxes(corners, K, poses, (64, 64), gt_points=pts)
    assert kept.shape[0] == 1 and no_labels is None


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from boxfusion_tpu.runtime.device_state import init_state
    from boxfusion_tpu.utils.checkpoint import (
        restore_params,
        restore_pipeline_state,
        save_params,
        save_pipeline_state,
    )

    params = {"a": {"kernel": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones(4)}
    p = tmp_path / "params"
    save_params(str(p), params)
    back = restore_params(str(p))
    np.testing.assert_allclose(np.asarray(back["a"]["kernel"]), np.arange(6).reshape(2, 3))

    state = init_state(capacity=8, max_views=3, obs_capacity=16)
    state = state.tree_unflatten(None, state.tree_flatten()[0])  # copy
    import dataclasses

    state = dataclasses.replace(state, n=jnp.int32(2), scores=state.scores.at[0].set(0.5))
    sp = tmp_path / "pipeline"
    save_pipeline_state(str(sp), state)
    restored = restore_pipeline_state(str(sp))
    assert int(restored.n) == 2
    assert float(restored.scores[0]) == 0.5
    assert restored.flist.shape == (8, 3)


def test_checkpoint_restores_legacy_stats_width(tmp_path):
    """Snapshots saved before stats existed (or with a narrower stats vector)
    must restore zero-padded to the current STATS_WIDTH, or the restored
    state's leaf shapes diverge from init_state and the fused program's
    stats[4] scatter is silently dropped."""
    import dataclasses

    import jax.numpy as jnp

    from boxfusion_tpu.runtime.device_state import STATS_WIDTH, init_state
    from boxfusion_tpu.utils.checkpoint import (
        _ckptr,
        restore_pipeline_state,
        save_pipeline_state,
    )

    state = init_state(capacity=4, max_views=3, obs_capacity=8)

    # absent stats (pre-stats snapshot)
    tree = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
        if f.name != "stats"
    }
    p0 = tmp_path / "legacy0"
    _ckptr().save(str(p0.resolve()), tree, force=True)
    r0 = restore_pipeline_state(str(p0))
    assert r0.stats.shape == (STATS_WIDTH,)
    assert int(jnp.sum(r0.stats)) == 0

    # narrower stats (the 4-counter era), with counters set
    state4 = dataclasses.replace(state, stats=jnp.asarray([1, 2, 3, 4], jnp.int32))
    p1 = tmp_path / "legacy4"
    save_pipeline_state(str(p1), state4)
    r1 = restore_pipeline_state(str(p1))
    assert r1.stats.shape == (STATS_WIDTH,)
    assert r1.stats[:4].tolist() == [1, 2, 3, 4] and int(r1.stats[4]) == 0


def test_gt_filter_labels_lockstep(tmp_path):
    """filter_gt_boxes filters labels in lockstep with corners and writes
    after_filter_labels.npy next to after_filter_boxes.npy."""
    from boxfusion_tpu.data_process.gt_filter import filter_gt_boxes

    # camera at origin looking +z; one box in view, one behind the camera
    corners = np.stack([
        np.array([[x, y, z] for x in (-.2, .2) for y in (-.2, .2) for z in (1.8, 2.2)], np.float32),
        np.array([[x, y, z] for x in (-.2, .2) for y in (-.2, .2) for z in (-2.2, -1.8)], np.float32),
    ])
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    poses = np.eye(4)[None]
    out = tmp_path / "after_filter_boxes.npy"
    kept, labels = filter_gt_boxes(
        corners, K, poses, (48, 64), save_path=str(out),
        labels=np.array(["chair", "table"]),
    )
    assert kept.shape == (1, 8, 3) and list(labels) == ["chair"]
    assert np.load(out).shape == (1, 8, 3)
    lbl = np.load(tmp_path / "after_filter_labels.npy")
    assert list(lbl) == ["chair"]


def test_gt_filter_cli_saves_labels_from_instances(tmp_path):
    """filter-gt subcommand picks categories out of instances.json."""
    import json

    from boxfusion_tpu.data_process.__main__ import main as prep_main

    seq = tmp_path / "42898867"
    (seq / "depth").mkdir(parents=True)
    from PIL import Image

    Image.fromarray(np.zeros((48, 64), np.uint16)).save(seq / "depth" / "0.png")
    box = [[x, y, z] for x in (-.2, .2) for y in (-.2, .2) for z in (1.8, 2.2)]
    far = [[x, y, -z] for x, y, z in box]
    (seq / "instances.json").write_text(json.dumps([
        {"corners": box, "category": "chair"},
        {"corners": far, "category": "table"},
    ]))
    np.savetxt(seq / "K_depth.txt", np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]]))
    np.save(seq / "all_poses.npy", np.eye(4)[None])

    rc = prep_main(["filter-gt", str(seq)])
    assert rc == 0
    assert np.load(seq / "after_filter_boxes.npy").shape == (1, 8, 3)
    assert list(np.load(seq / "after_filter_labels.npy")) == ["chair"]


def test_ca1m_start_offset_aligns_per_frame_tables(tmp_path):
    """With data.start > 0, the per-frame K_all/K_scales tables must be
    sliced by the same offset as the frame lists -- otherwise frame
    ``start`` silently gets frame 0's intrinsics and depth scale
    (capture_stream.py:339-350 indexes the tables by the ABSOLUTE frame
    number)."""
    from boxfusion_tpu.data.readers import CA1MDataset
    from boxfusion_tpu.utils.config import load_config

    cap = _write_capture(tmp_path, n_frames=4)
    out = tmp_path / "slam" / "42898867"
    convert_capture_to_slam(str(cap), str(out))

    # distinct per-frame intrinsics/scales so misalignment is detectable
    n = 4
    K_all = np.tile(np.eye(3, dtype=np.float32)[None], (n, 1, 1))
    K_all[:, 0, 0] = 100.0 + np.arange(n)  # fx = 100, 101, 102, 103
    K_all[:, 1, 1] = 100.0 + np.arange(n)
    K_all[:, 0, 2] = 32.0
    K_all[:, 1, 2] = 24.0
    np.save(out / "K_all.npy", K_all)
    np.save(out / "K_scales.npy", 1.0 + np.arange(n, dtype=np.float32))

    def read(start):
        cfg = load_config("config/ca1m.yaml")
        cfg["data"]._data["datadir"] = str(out)
        cfg["data"]._data["start"] = start
        cfg["cam"]._data["H"] = 64
        cfg["cam"]._data["W"] = 48
        return list(CA1MDataset(cfg))

    full = read(0)
    sliced = read(2)
    assert len(full) == 4 and len(sliced) == 2
    # frame index 0 of the sliced stream is ABSOLUTE frame 2: its oriented
    # intrinsics and metric depth must match the unsliced stream exactly
    np.testing.assert_array_equal(sliced[0].K, full[2].K)
    np.testing.assert_array_equal(sliced[0].depth, full[2].depth)
    assert not np.array_equal(sliced[0].K, full[0].K)  # tables ARE distinct


def test_write_ca1m_sequence_roundtrip(tmp_path):
    """write_ca1m_sequence -> CA1MDataset is lossless (bench.py's
    I/O-inclusive figure depends on the disk round-trip preserving the
    synthetic workload: images exact, depth to 16-bit-mm quantization,
    K and gt_pose exact, orientation passthrough for upright poses)."""
    from boxfusion_tpu.data.readers import CA1MDataset, write_ca1m_sequence
    from boxfusion_tpu.data.synthetic import SyntheticSequence
    from boxfusion_tpu.utils.config import load_config

    seq = SyntheticSequence(n_frames=4, n_boxes=3, image_hw=(48, 64), seed=3)
    frames = list(seq)
    out = tmp_path / "42898867"
    assert write_ca1m_sequence(frames, str(out)) == 4

    cfg = load_config("config/ca1m.yaml")
    cfg["data"]._data["datadir"] = str(out)
    cfg["data"]._data["start"] = 0
    # reader size is (w, h) via (cam.H, cam.W) -- landscape 64x48
    cfg["cam"]._data["H"] = 64
    cfg["cam"]._data["W"] = 48
    cfg["cam"]._data["png_depth_scale"] = 1000.0
    back = list(CA1MDataset(cfg))
    assert len(back) == 4
    for a, b in zip(frames, back):
        np.testing.assert_array_equal(a.image, b.image)
        assert a.depth.shape == b.depth.shape
        np.testing.assert_allclose(a.depth, b.depth, atol=1.01e-3)
        np.testing.assert_allclose(a.K, b.K, rtol=1e-6)
        np.testing.assert_allclose(a.gt_pose, b.gt_pose, atol=1e-6)

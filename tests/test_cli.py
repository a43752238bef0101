"""End-to-end drives of the main CLI (reference demo.py:389-467 parity).

Every engine choice is exercised against the synthetic dataset with a
small-capacity config so the whole argv -> pipeline -> saved-pickle path
runs in CI (the heavier engine internals have their own suites).
"""
import os
import pickle

import numpy as np
import yaml

from boxfusion_tpu import cli


def _small_cfg(tmp_path, **overrides):
    with open("config/ca1m.yaml") as f:
        raw = yaml.safe_load(f)
    raw["data"]["gap"] = 5
    raw["data"]["output_dir"] = str(tmp_path / "out")
    raw["detection"]["score_thresh"] = 0.3
    raw["detection"]["uv_bound"] = False
    raw["detection"]["floor_mask"] = False
    raw["detection"]["max_detections"] = 16
    raw["box_fusion"]["pst_path"] = None
    raw["box_fusion"]["pst_size"] = 128
    raw["box_fusion"]["iters"] = 4
    raw["box_fusion"]["max_fusions_per_frame"] = 4
    raw["association"]["max_views"] = 5
    raw["vis"]["rerun"] = False
    for k, v in overrides.items():
        sect, key = k.split(".")
        raw[sect][key] = v
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(raw))
    return str(p)


def _enable_eval(cfg):
    with open(cfg) as f:
        raw = yaml.safe_load(f)
    raw["eval"] = True
    with open(cfg, "w") as f:
        f.write(yaml.safe_dump(raw))


def test_cli_device_engine_saves_eval_pickle(tmp_path, capsys):
    cfg = _small_cfg(tmp_path)
    _enable_eval(cfg)

    rc = cli.main(["synthetic", "--config", cfg, "--engine", "device",
                   "--capacity", "48"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "device engine:" in out
    pkl = tmp_path / "out" / "synthetic_boxes.pkl"
    assert pkl.exists()
    with open(pkl, "rb") as f:
        saved = pickle.load(f)
    # reference pickle format: [[(frame, corners(8,3), score), ...]]
    assert len(saved) == 1 and len(saved[0]) >= 1
    assert np.asarray(saved[0][0][1]).shape == (8, 3)


def test_cli_fused_engine_falls_back_on_synthetic(tmp_path, capsys):
    cfg = _small_cfg(tmp_path)
    rc = cli.main(["synthetic", "--config", cfg, "--engine", "fused",
                   "--capacity", "48"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "falling back" in out and "engine:" in out


def test_cli_host_engine_runs(tmp_path, capsys):
    cfg = _small_cfg(tmp_path)
    rc = cli.main(["synthetic", "--config", cfg, "--engine", "host"])
    assert rc == 0


def test_cli_skip_if_output_exists(tmp_path, capsys):
    """demo.py:434-436: an existing eval pickle short-circuits the run."""
    cfg = _small_cfg(tmp_path)
    _enable_eval(cfg)
    os.makedirs(tmp_path / "out", exist_ok=True)
    (tmp_path / "out" / "42_boxes.pkl").write_bytes(b"x")
    rc = cli.main(["ca1m", "--config", cfg, "--seq", "42"])
    assert rc == 0
    assert "already exist" in capsys.readouterr().out


def test_cli_save_and_restore_state(tmp_path, capsys):
    """--save-state / --restore-state round-trip through the device engine."""
    cfg = _small_cfg(tmp_path)
    snap = tmp_path / "snap"
    rc = cli.main(["synthetic", "--config", cfg, "--engine", "device",
                   "--capacity", "48", "--save-state", str(snap)])
    assert rc == 0
    assert "saved pipeline state" in capsys.readouterr().out
    assert snap.exists()

    rc = cli.main(["synthetic", "--config", cfg, "--engine", "device",
                   "--capacity", "48", "--restore-state", str(snap),
                   "--restore-count", "60"])
    assert rc == 0
    assert "resumed pipeline state" in capsys.readouterr().out


def test_cli_fused_engine_on_disk_ca1m(tmp_path, capsys):
    """The complete user path: raw capture dir -> SLAM conversion -> CA-1M
    reader -> FUSED single-dispatch engine (random CuTR) -> eval pickle."""
    from tests.test_dataprocess import _write_capture

    from boxfusion_tpu.data_process import convert_capture_to_slam

    cap = _write_capture(tmp_path, n_frames=11)
    slam = tmp_path / "slam" / "42898867"
    convert_capture_to_slam(str(cap), str(slam))

    cfg = _small_cfg(tmp_path)
    _enable_eval(cfg)
    with open(cfg) as f:
        raw = yaml.safe_load(f)
    raw["data"]["datadir"] = str(slam)
    # CA-1M convention: cam.H = width, cam.W = height (landscape 48x64)
    raw["cam"]["H"] = 64
    raw["cam"]["W"] = 48
    with open(cfg, "w") as f:
        f.write(yaml.safe_dump(raw))

    rc = cli.main([str(slam), "--config", cfg, "--engine", "fused",
                   "--capacity", "32", "--dimension", "192"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "fused engine:" in out
    assert (tmp_path / "out" / "42898867_boxes.pkl").exists()


def test_cli_validate_checkpoint(tmp_path, capsys):
    """--validate-checkpoint: converts a real .pth, runs one frame, prints
    activation digests + timing, exits 0 (real-weights readiness; the
    reference's primary mode loads cutr_rgbd.pth, demo.py:441-446)."""
    import jax
    import jax.numpy as jnp
    import torch

    from boxfusion_tpu.models.cutr import FrameBatch, make_cutr
    from boxfusion_tpu.models.cutr.convert import flax_to_torch_template

    model = make_cutr(dimension=192, depth_model=True)
    batch = FrameBatch(
        image=jnp.zeros((1, 256, 256, 3)),
        depth=jnp.zeros((1, 256, 256, 1)),
        K=jnp.tile(jnp.eye(3)[None] * 100, (1, 1, 1)),
        image_hw=jnp.array([[200.0, 240.0]]),
        depth_params=jnp.ones((1, 2)),
        T_gravity=jnp.tile(jnp.eye(3)[None], (1, 1, 1)),
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    sd = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in flax_to_torch_template(params).items()
    }
    pth = tmp_path / "cutr_rgbd.pth"
    torch.save({"model": sd}, pth)

    cfg = _small_cfg(tmp_path)
    rc = cli.main(
        ["synthetic", "--config", cfg, "--model-path", str(pth),
         "--validate-checkpoint"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "CuTR dim=192 depth_model=True" in out
    assert "CuTR forward:" in out and "ms" in out
    assert "scores" in out and "sha=" in out
    assert "[validate] OK" in out


def test_cli_validate_checkpoint_missing_file(tmp_path, capsys):
    cfg = _small_cfg(tmp_path)
    rc = cli.main(
        ["synthetic", "--config", cfg, "--model-path",
         str(tmp_path / "nope.pth"), "--validate-checkpoint"]
    )
    assert rc == 1
    assert "checkpoint not found" in capsys.readouterr().err

"""Trainer driver (python -m boxfusion_tpu.train) end-to-end on the CPU mesh.

The reference has no trainer (unreleased, README.md:23); this checks the
framework's own training loop: synthetic oracle-supervised data, sharded
step over the conftest's 8-virtual-device mesh, LR schedule, and orbax
checkpointing.
"""
import os

import numpy as np


def test_train_cli_runs_and_checkpoints(tmp_path, capsys):
    from boxfusion_tpu.train.__main__ import main

    ckpt = tmp_path / "ckpt"
    main([
        "--steps", "4", "--batch", "8", "--dim", "192",
        "--image-size", "256", "--n-sequences", "1", "--frames-per-seq", "4",
        "--n-boxes", "4", "--log-every", "2", "--warmup", "2",
        "--ckpt-dir", str(ckpt), "--ckpt-every", "4",
    ])
    out = capsys.readouterr().out
    assert "mesh" in out and "step " in out
    losses = [
        float(line.split("loss")[1].split("|")[0])
        for line in out.splitlines()
        if "| loss" in line
    ]
    assert losses and all(np.isfinite(l) for l in losses)
    saved = ckpt / "step_0000004"
    assert saved.exists() and any(os.scandir(saved))


def test_train_cli_batch_divisibility_error():
    import pytest

    from boxfusion_tpu.train.__main__ import main

    with pytest.raises(SystemExit, match="divisible"):
        main(["--steps", "1", "--batch", "3"])


def test_corners_to_params_roundtrip():
    """corners_to_params inverts box_corners for random oriented boxes."""
    import jax.numpy as jnp

    from boxfusion_tpu.geometry.boxes import box_corners, corners_to_params
    from boxfusion_tpu.geometry.rotation import euler_angles_to_matrix

    rng = np.random.RandomState(0)
    xyzlhw = np.concatenate(
        [rng.uniform(-2, 2, (16, 3)), rng.uniform(0.1, 2.0, (16, 3))], -1
    ).astype(np.float32)
    R = np.asarray(
        euler_angles_to_matrix(
            jnp.asarray(rng.uniform(-np.pi, np.pi, (16, 3)), jnp.float32), "YXZ"
        )
    )
    corners = box_corners(jnp.asarray(xyzlhw), jnp.asarray(R))
    got_p, got_R = corners_to_params(corners)
    np.testing.assert_allclose(np.asarray(got_p), xyzlhw, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_R), R, atol=1e-4)


def test_train_cli_real_ca1m_sequence(tmp_path, capsys):
    """--data-root mode: raw capture -> SLAM conversion -> GT filter ->
    trainer consumes the real CA-1M-layout sequence end to end."""
    import jax.numpy as jnp

    from test_dataprocess import _write_capture

    from boxfusion_tpu.data_process.__main__ import main as prep_main
    from boxfusion_tpu.geometry.boxes import box_corners
    from boxfusion_tpu.train.__main__ import main as train_main

    cap = _write_capture(tmp_path, n_frames=4, hw=(48, 64))
    out = tmp_path / "slam" / "42898867"
    assert prep_main(["convert", str(cap), str(out)]) == 0

    # two GT boxes in front of the camera path, in box_corners vertex order
    xyzlhw = np.array(
        [[0.0, 0.0, 1.2, 0.4, 0.3, 0.2], [0.3, -0.1, 1.5, 0.2, 0.2, 0.5]],
        np.float32,
    )
    R = np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1))
    corners = np.asarray(box_corners(jnp.asarray(xyzlhw), jnp.asarray(R)))
    np.save(out / "after_filter_boxes.npy", corners)

    cfg_path = tmp_path / "cfg.yaml"
    base = open("config/ca1m.yaml").read()
    # landscape 48x64 capture: CA-1M convention stores W=height, H=width
    cfg_path.write_text(base.replace("H: 384", "H: 64").replace("W: 512", "W: 48"))

    train_main([
        "--steps", "2", "--batch", "8", "--dim", "192",
        "--data-root", str(out), "--train-config", str(cfg_path),
        "--gap", "1", "--n-boxes", "4", "--depth-ratio", "4",
        "--log-every", "1", "--warmup", "1",
    ])
    outtxt = capsys.readouterr().out
    assert "dataset: 4 frames" in outtxt
    losses = [
        float(line.split("loss")[1].split("|")[0])
        for line in outtxt.splitlines()
        if "| loss" in line
    ]
    assert losses and all(np.isfinite(l) for l in losses)

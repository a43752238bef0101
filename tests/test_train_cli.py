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

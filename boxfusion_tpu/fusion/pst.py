"""Pre-sampled Search Table (PST) loading.

Capability target: BoxFusion.__init__ loading ``data/pst_1024_0.tiff`` via
``cv2.imread(-1)`` (reference box_fusion.py:31-32): a (1024, 6) float32
table in roughly [-1, 1] whose row 0 is the all-zero identity particle.
cv2 is not required here -- PIL reads the float tiff directly, and a
deterministic fallback generator reproduces the table's structure (row 0
zero, remaining rows quasi-random in [-1, 1]) when the asset is absent.
"""
from __future__ import annotations

import os

import numpy as np


def load_pst(path: str | None, pst_size: int = 1024) -> np.ndarray:
    """Load the (pst_size, 6) particle table, or synthesize one.

    Args:
      path: tiff path (float32 image of shape (pst_size, 6)); None or a
        missing file falls back to a scrambled-Halton table.

    Returns:
      (pst_size, 6) float32, row 0 all zeros.
    """
    if path and os.path.exists(path):
        from PIL import Image

        arr = np.asarray(Image.open(path), dtype=np.float32)
        if arr.ndim != 2 or arr.shape[1] != 6:
            raise ValueError(
                f"Unexpected PST shape {arr.shape} from {path}; expected a "
                f"({pst_size}, 6) float32 tiff (reference box_fusion.py:31-32)"
            )
        if arr.shape[0] < pst_size:
            raise ValueError(
                f"PST {path} has {arr.shape[0]} rows < requested pst_size "
                f"{pst_size}; lower box_fusion.pst_size or supply a larger table"
            )
        if not np.allclose(arr[0], 0.0):
            raise ValueError(
                f"PST {path} row 0 is {arr[0]}, expected the all-zero identity "
                "particle (the optimizer's no-move baseline, box_fusion.py:482)"
            )
        return arr[:pst_size]
    if path:
        raise FileNotFoundError(
            f"PST file not found: {path} (set box_fusion.pst_path to the "
            "reference's data/pst_1024_0.tiff, or null to synthesize a table)"
        )
    return synthesize_pst(pst_size)


def synthesize_pst(pst_size: int = 1024, seed: int = 0) -> np.ndarray:
    """Deterministic low-discrepancy stand-in for the shipped PST asset."""
    from scipy.stats import qmc

    sampler = qmc.Halton(d=6, scramble=True, seed=seed)
    table = (sampler.random(pst_size) * 2.0 - 1.0).astype(np.float32)
    table[0] = 0.0
    return table

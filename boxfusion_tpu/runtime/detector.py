"""CuTR detector wrapper: Frame -> numpy detections.

Bridges the host data pipeline and the jitted model, caching one compiled
executable per (square_pad, rgb/depth ratio) bucket so recompiles stay
bounded exactly like the reference's square-pad bucketing intends
(reference imagelist.py:87-97).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np

from boxfusion_tpu.data.preprocess import Preprocessor
from boxfusion_tpu.data.readers import Frame
from boxfusion_tpu.models.cutr import CubifyTransformer


class CuTRDetector:
    """Callable detector: Frame -> dict of numpy arrays (camera-frame boxes).

    Output keys: scores, pred_classes, pred_boxes (xyxy), pred_logits,
    boxes3d (xyzlhw, camera frame), R, proj_xy, object_desc -- the same
    fields the reference's ``Instances3D`` carries out of
    CubifyTransformer.inference (reference cubify_transformer.py:961-977).
    """

    def __init__(
        self,
        model: CubifyTransformer,
        params,
        donate: bool = False,
        device_output: bool = False,
    ):
        self.model = model
        self.params = params
        self.preprocessor = Preprocessor()
        self._apply = jax.jit(model.apply)
        # device_output: return jax arrays without any D2H sync, enabling the
        # DevicePipeline's fully device-resident detect->associate->fuse path.
        self.device_output = device_output

    def __call__(self, frame: Frame) -> Dict[str, np.ndarray]:
        batch, _, _ = self.preprocessor(
            frame.image, frame.depth, frame.K, frame.T_gravity
        )
        out = self._apply(self.params, batch)
        take = (
            "scores",
            "pred_classes",
            "pred_boxes",
            "pred_logits",
            "boxes3d",
            "R",
            "proj_xy",
            "object_desc",
        )
        if self.device_output:
            return {k: v[0] for k, v in out.items() if k in take}
        return {k: np.asarray(v[0]) for k, v in out.items() if k in take}

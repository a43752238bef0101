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
        export_image: bool = False,
    ):
        self.model = model
        self.params = params
        self.preprocessor = Preprocessor()
        self._apply = jax.jit(model.apply)
        # device_output: return jax arrays without any D2H sync, enabling the
        # DevicePipeline's fully device-resident detect->associate->fuse path.
        self.device_output = device_output
        # export_image: additionally return the de-normalized [0,255] device
        # image under "image_dev" so on-device open-vocab labeling (CLIP
        # crops) needs no extra host->device transfer.
        self.export_image = export_image

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
            det = {k: v[0] for k, v in out.items() if k in take}
            if self.export_image:
                det["image_dev"] = _denormalize(batch.image[0])
            return det
        return {k: np.asarray(v[0]) for k, v in out.items() if k in take}


@jax.jit
def _denormalize(image):
    """Invert the detector pixel normalization back to [0, 255] RGB
    (exact: the u8-truncated constants round-trip, data/preprocess.py:83-88)."""
    from boxfusion_tpu.data.preprocess import PIXEL_MEAN_U8, PIXEL_STD_U8
    import jax.numpy as jnp

    return image * jnp.asarray(PIXEL_STD_U8) + jnp.asarray(PIXEL_MEAN_U8)

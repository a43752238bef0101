from boxfusion_tpu.fusion.kernel import (
    convex_polygon_iou,
    multiview_fitness,
    perturb_candidates,
)
from boxfusion_tpu.fusion.pst import load_pst, synthesize_pst
from boxfusion_tpu.fusion.optimizer import PSTOptConfig, init_opt_params, optimize_boxes
from boxfusion_tpu.fusion.manager import (
    BoxManager,
    correspondence_association,
    nms_3d,
)
from boxfusion_tpu.fusion.association import (
    iou_block,
    project_global_boxes_2d,
    project_observation_corners,
)

__all__ = [
    "convex_polygon_iou",
    "multiview_fitness",
    "perturb_candidates",
    "load_pst",
    "synthesize_pst",
    "PSTOptConfig",
    "init_opt_params",
    "optimize_boxes",
    "BoxManager",
    "correspondence_association",
    "nms_3d",
    "iou_block",
    "project_global_boxes_2d",
    "project_observation_corners",
]

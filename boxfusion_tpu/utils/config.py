"""Config system: schema-validated YAML with defaults.

Capability target: the reference's flat-YAML + argparse config (reference
demo.py:410-436, config/*.yaml) -- with two fixes the reference lacks:

1. A *schema with defaults*, so keys that exist only in some reference
   configs (``detection.class_sim_thres``, ``detection.size_max_thres``,
   ``box_fusion.clip_sim_coeff`` -- present only in cubicle.yaml:23-24,46,
   while demo.py:146,167,170 requires them unconditionally) no longer
   KeyError: they default to values that disable the corresponding feature.
2. Unknown-key detection, so typos fail loudly.

The loaded config is still dict-like (``cfg["box_fusion"]["iters"]``) for
reference-parity call sites, plus attribute access (``cfg.box_fusion.iters``).
"""
from __future__ import annotations

import copy
from typing import Any, Dict, Optional

import yaml

# Defaults mirror config/ca1m.yaml of the reference; cubicle-only keys get
# feature-off defaults.
DEFAULTS: Dict[str, Any] = {
    "dataset": "CA1M",
    "data": {
        "datadir": "",
        "start": 0,
        "output_dir": None,
        "gap": 20,
    },
    "cam": {
        "H": 384,
        "W": 512,
        "fx": None,
        "fy": None,
        "cx": None,
        "cy": None,
        "png_depth_scale": 1000.0,
    },
    "detection": {
        "score_thresh": 0.4,
        "uv_bound": True,
        "uv_bound_value": 0.9,
        "floor_mask": True,
        "floor_ratio": 15,
        "scale_box": 1.5,
        # cubicle.yaml-only keys with feature-off defaults:
        "class_sim_thres": 0.0,
        "size_max_thres": 0.0,  # 0 disables the large-box filter
        # TPU-specific static capacities:
        "max_detections": 100,
        # Detector compute dtype: "float32" or "bfloat16" (MXU-native; the
        # coordinate math stays f32 either way -- models/cutr/model.py).
        "compute_dtype": "float32",
        # Device-resident labeling: CLIP crops for the top-N detections per
        # keyframe (static shape; N >= the post-score-filter count keeps
        # reference behavior exactly).
        "max_label_boxes": 32,
        # Bucketed label batch (fused B=1 engine only): pick the smallest
        # crop-count bucket >= the live detection count ON DEVICE
        # (lax.switch, no D2H), so a 45-detection keyframe pays ~64 crops'
        # CLIP FLOPs instead of the full max_label_boxes pad.  Decisions
        # are identical (rows past the live count are score-masked to -1e9
        # either way).  One compile per bucket.
        "label_bucketing": True,
    },
    "association": {
        "small_threshold": 0.2,
        "rotation_gap": 30.0,
        "translation_gap": 0.8,
        # TPU-specific static capacities:
        "max_global_boxes": 512,
        "max_observations": 4096,
        "max_views": 10,
        # Loop engine for the device keyframe step: "auto" picks "unrolled"
        # (straight-line cond-gated replay, identical decisions) on the axon
        # tunnel -- whose while-loop dispatch path degrades the whole process
        # (docs/TUNNEL_PERF_NOTES.md) -- and "loops" (lax.while_loop)
        # everywhere else.
        "engine": "auto",
    },
    "box_fusion": {
        "use": True,
        "iters": 20,
        "pst_path": "./data/pst_1024_0.tiff",
        "pst_size": 1024,
        "random_opt": {
            "center_init_size": 0.1,
            "center_scaling_coefficient": 0.1,
            "shape_init_size": 0.5,
            "shape_scaling_coefficient": 0.5,
        },
        "check_valid": False,
        "nms_threshold": 0.1,
        "small_size": 0.5,
        "clip_sim_coeff": 0.0,  # cubicle.yaml:46; 0 disables CLIP score boost
        "max_fusions_per_frame": 16,
    },
    "vis": {
        "rerun": False,
        "show_class": False,
        "show_label": False,
        "trajectory": True,
        # log the GT depth backprojection as a colored world point cloud for
        # visual comparison (reference demo.py:121-127 viz_on_gt_points)
        "gt_points": False,
    },
    "eval": False,
}


class Config:
    """Nested dict with attribute access; validated against DEFAULTS."""

    def __init__(self, data: Dict[str, Any]):
        self._data = data

    def __getitem__(self, key: str) -> Any:
        v = self._data[key]
        return Config(v) if isinstance(v, dict) else v

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = value

    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return self[key]
        except KeyError:
            raise AttributeError(f"No config key '{key}'") from None

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def get(self, key: str, default: Any = None) -> Any:
        v = self._data.get(key, default)
        return Config(v) if isinstance(v, dict) else v

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self._data)

    def keys(self):
        return self._data.keys()

    def items(self):
        return self._data.items()

    def __repr__(self):
        return f"Config({self._data!r})"


def _merge(defaults: Dict[str, Any], overrides: Dict[str, Any], path: str = "") -> Dict[str, Any]:
    out = copy.deepcopy(defaults)
    for k, v in overrides.items():
        where = f"{path}.{k}" if path else k
        if k not in out:
            raise KeyError(f"Unknown config key: {where}")
        if isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = _merge(out[k], v, where)
        else:
            out[k] = v
    return out


def load_config(path: Optional[str] = None, overrides: Optional[Dict[str, Any]] = None) -> Config:
    """Load a YAML config merged over DEFAULTS.

    Args:
      path: YAML file path (may be None for pure defaults).
      overrides: an extra dict merged last.
    """
    data = copy.deepcopy(DEFAULTS)
    if path is not None:
        with open(path) as f:
            user = yaml.safe_load(f) or {}
        data = _merge(data, user)
    if overrides:
        data = _merge(data, overrides)
    return Config(data)


def read_lines(path: str) -> list:
    """Non-empty stripped lines of a text file.

    Replaces np.genfromtxt for id/class lists: genfromtxt returns a 0-d
    array for single-line files (iterating it yields characters or raises)
    and silently truncates lines at '#' (its comment char).
    """
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]

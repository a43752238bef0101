from boxfusion_tpu.models.clip.head import OpenVocabLabeler, build_labeler, scale_boxes
from boxfusion_tpu.models.clip.model import CLIPImageTower, CLIPTextTower, CLIPConfig

__all__ = [
    "OpenVocabLabeler",
    "build_labeler",
    "scale_boxes",
    "CLIPImageTower",
    "CLIPTextTower",
    "CLIPConfig",
]

from boxfusion_tpu.runtime.detector import CuTRDetector
from boxfusion_tpu.runtime.pipeline import OnlinePipeline, WorldState

__all__ = ["CuTRDetector", "OnlinePipeline", "WorldState"]

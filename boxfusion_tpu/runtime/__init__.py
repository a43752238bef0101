from boxfusion_tpu.runtime.batched import BatchedPipeline
from boxfusion_tpu.runtime.detector import CuTRDetector
from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
from boxfusion_tpu.runtime.fused import FusedDevicePipeline
from boxfusion_tpu.runtime.pipeline import OnlinePipeline, WorldState

__all__ = [
    "BatchedPipeline",
    "CuTRDetector",
    "DevicePipeline",
    "FusedDevicePipeline",
    "OnlinePipeline",
    "WorldState",
]

from boxfusion_tpu.ops.attention import tiled_attention

__all__ = ["tiled_attention"]

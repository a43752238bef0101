from boxfusion_tpu.models.cutr.model import (
    CubifyTransformer,
    CuTRConfig,
    FrameBatch,
    make_cutr,
)

__all__ = ["CubifyTransformer", "CuTRConfig", "FrameBatch", "make_cutr"]

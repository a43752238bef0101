from boxfusion_tpu.native.loader import (
    NativeLoader,
    Prefetcher,
    get_loader,
    native_available,
)

__all__ = ["NativeLoader", "Prefetcher", "get_loader", "native_available"]

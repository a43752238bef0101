from boxfusion_tpu.data.preprocess import (
    SQUARE_PAD_BUCKETS,
    Preprocessor,
    pick_square_pad,
    standardize_depth,
)
from boxfusion_tpu.data.readers import CA1MDataset, ScannetDataset, get_dataset
from boxfusion_tpu.data.synthetic import SyntheticSequence

__all__ = [
    "SQUARE_PAD_BUCKETS",
    "Preprocessor",
    "pick_square_pad",
    "standardize_depth",
    "CA1MDataset",
    "ScannetDataset",
    "get_dataset",
    "SyntheticSequence",
]

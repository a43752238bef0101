"""boxfusion_tpu: TPU-native reconstruction-free open-vocabulary 3D detection.

A from-scratch JAX/XLA framework with the capabilities of BoxFusion
(arXiv:2506.15610): online multi-view 3D object detection and box fusion
from posed RGB-D streams, built TPU-first -- jitted static-shape compute,
device-resident fusion optimization, mesh-sharded training/eval.

Subpackages:
  geometry/    pure-jnp box/projection/IoU/orientation kernels
  structures/  Instances, GeneralBoxes3D, sensor metadata (pytrees)
  models/cutr  the CuTR RGB-D detector (flax) + checkpoint converter
  models/clip  CLIP towers + open-vocab labeling head
  fusion/      association (OBB IoU + NMS bookkeeping) + PST optimizer
  data/        CA-1M / ScanNet readers, preprocessing, synthetic scenes
  runtime/     the online per-frame pipeline
  train/       set losses + sharded train step
  parallel/    device mesh + dp/fsdp/tp shardings
  utils/       config, io, viz
"""

__version__ = "0.1.0"

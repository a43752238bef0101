"""boxfusion_tpu: TPU-native reconstruction-free open-vocabulary 3D object detection.

A ground-up JAX/XLA/Pallas re-design of the capabilities of BoxFusion
(reference: pliam1105/BoxFusion): a posed RGB-D stream is run through a
CuTR-style RGB-D ViT detector on keyframes, detections are labeled
open-vocabulary via CLIP, and per-frame 3D boxes are incrementally associated
and fused into a persistent world-frame box set -- without reconstruction.

Design stance (vs. the torch/CUDA reference):
  * pure-functional geometry core on registered pytrees (jit/vmap/scan safe)
  * static shapes + masks everywhere (fixed world capacity, 5-view fusion slots)
  * the whole keyframe update (filters -> association -> bookkeeping -> PST
    fusion) is one jitted device-resident function; no host bounces
  * multi-view IoU fitness evaluated as a fused vectorized kernel over the
    (particles x views) grid instead of a PyCUDA kernel fed per-iteration

Subpackages:
  geometry/  box parametrization, corners, projection, IoU (2D/OBB)
  data/      dataset readers (CA-1M, ScanNet), preprocessing, sensor metadata
  model/     CuTR detector (RGB-D ViT + DETR-style prompt decoder) in flax
  clip/      open-vocabulary CLIP head (image/text towers + crop scoring)
  fusion/    world-state association, box manager, PST random optimizer
  runtime/   online keyframe pipeline, device mesh / sharded eval
  viz/       optional rerun visualization
  cli/       demo-compatible command line drivers
"""

__version__ = "0.1.0"

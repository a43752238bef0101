"""Stage breakdown of the fused real-path keyframe on the attached chip.

Times, with serialized dependency chains (no dedup/overlap):
  1. CuTR-768 bf16 forward alone
  2. batched_crop_resize alone (32 crops)
  3. CLIP ViT-L bf16 image tower alone (32 crops)
  4. full label boost (crops + tower + sims + scatter)
  5. keyframe step alone (capacity 256, oracle load)
  6. fused keyframe program without labeler
  7. fused keyframe program with labeler
  8. host->device upload of the packed ~1 MB buffer

Run: python tools/profile_fused.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timeit(fn, *args, reps=10, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    from boxfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
    from boxfusion_tpu.models.clip.head import OpenVocabLabeler, batched_crop_resize
    from boxfusion_tpu.models.clip.model import CLIPConfig
    from boxfusion_tpu.models.cutr import FrameBatch, make_cutr
    from boxfusion_tpu.runtime.detector import CuTRDetector
    from boxfusion_tpu.runtime.device_pipeline import DevicePipeline
    from boxfusion_tpu.runtime.fused import FusedDevicePipeline
    from boxfusion_tpu.utils.config import load_config

    S, r, dim = 512, 1, 768
    model = make_cutr(dimension=dim, depth_model=True, dtype="bfloat16")
    rng = np.random.RandomState(0)
    f = 0.6 * S
    batch = FrameBatch(
        image=jnp.asarray(rng.randn(1, S, S, 3), jnp.float32),
        depth=jnp.asarray(rng.randn(1, S // r, S // r, 1), jnp.float32),
        K=jnp.asarray([[[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]]], jnp.float32),
        image_hw=jnp.asarray([[0.75 * S, S]], jnp.float32),
        depth_params=jnp.asarray([[2.0, 0.5]], jnp.float32),
        T_gravity=jnp.eye(3, dtype=jnp.float32)[None],
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), batch)
    fwd = jax.jit(model.apply)
    print(f"1. CuTR fwd:            {_timeit(fwd, params, batch):8.2f} ms")

    image = jnp.asarray(rng.rand(384, 512, 3) * 255, jnp.float32)
    boxes = jnp.asarray(rng.rand(32, 4) * 200 + 10, jnp.float32)
    boxes = boxes.at[:, 2:].add(boxes[:, :2])
    print(f"2. crop_resize 32:      {_timeit(batched_crop_resize, image, boxes):8.2f} ms")

    clip_cfg = CLIPConfig(
        patch=14, width=1024, layers=24, heads=16, embed_dim=1024,
        dtype=jnp.bfloat16,
    )
    tf = np.random.RandomState(1).randn(473, 1024).astype(np.float32)
    labeler = OpenVocabLabeler(
        [f"c{i}" for i in range(473)], tf, cfg=clip_cfg
    ).init_random(0)
    crops = jnp.asarray(rng.rand(32, 224, 224, 3), jnp.float32)
    tower = jax.jit(labeler.tower.apply)
    print(f"3. CLIP tower 32:       {_timeit(tower, labeler.params, crops):8.2f} ms")

    scores = jnp.asarray(rng.rand(100), jnp.float32)
    det_boxes = jnp.asarray(rng.rand(100, 4) * 200 + 10, jnp.float32)
    hw = jnp.asarray([384.0, 512.0])

    def boost():
        return labeler._boost(
            image, det_boxes, scores, hw, jnp.float32(1.5), jnp.float32(0.0), 32
        )

    # NOTE: compiling _boost STANDALONE reproducibly kills the relay's
    # remote_compile channel (Broken pipe) on the tunneled chip, while the
    # same logic compiles fine inside the fused program.  Keep it optional.
    import os
    if os.environ.get("PROFILE_BOOST"):
        print(f"4. label boost full:    {_timeit(boost):8.2f} ms")
    else:
        print("4. label boost full:    skipped (PROFILE_BOOST=1 to enable)")

    cfg = load_config("config/ca1m.yaml")
    cfg["data"]._data["gap"] = 20
    cfg["detection"]._data["score_thresh"] = 0.3
    cfg["detection"]._data["uv_bound"] = False
    cfg["detection"]._data["floor_mask"] = False
    cfg["box_fusion"]._data["pst_path"] = None

    seq = SyntheticSequence(n_frames=41, n_boxes=8, image_hw=(384, 512), seed=0)
    frames = list(seq)

    # 5. keyframe step alone: oracle -> packed step (measures upload+step)
    pipe = DevicePipeline(cfg, OracleDetector(seq, noise=0.03, seed=1), capacity=256)
    for fr in frames[:1]:
        pipe.process_keyframe(fr)
    pipe.flush(); jax.block_until_ready(pipe.state.n)
    t0 = time.perf_counter()
    for fr in frames[1:21]:
        pipe.process_keyframe(fr)
    pipe.flush(); jax.block_until_ready(pipe.state.n)
    print(f"5. oracle step+upload:  {(time.perf_counter() - t0) / 20 * 1e3:8.2f} ms")

    # 6/7. fused programs
    for label, lab in (("no-labeler", None), ("with-labeler", labeler)):
        fp = FusedDevicePipeline(
            cfg, CuTRDetector(model, params), labeler=lab, capacity=256
        )
        fp.process_keyframe(frames[0])
        fp.flush(); jax.block_until_ready(fp.state.n)
        t0 = time.perf_counter()
        for fr in frames[1:21]:
            fp.process_keyframe(fr)
        fp.flush(); jax.block_until_ready(fp.state.n)
        print(f"6/7. fused {label:13s}{(time.perf_counter() - t0) / 20 * 1e3:8.2f} ms")

    # 8. raw upload cost of the packed buffer
    fp2 = FusedDevicePipeline(cfg, CuTRDetector(model, params), capacity=256)
    buf = fp2._pack_buffer(frames[0])
    t0 = time.perf_counter()
    for _ in range(20):
        jax.device_put(buf).block_until_ready()
    print(f"8. upload {buf.nbytes/1e6:.2f} MB:     {(time.perf_counter() - t0) / 20 * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()

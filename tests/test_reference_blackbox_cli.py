"""Black-box CLI parity: the reference's ``demo.py`` vs ``boxfusion_tpu.cli``.

The ONLY parity level not covered by the module-level suites: both entry
points run end-to-end on the SAME synthetic CA-1M folder with the SAME
checkpoint, and their eval pickles (``<video_id>_boxes.pkl``,
demo.py:368-381; ``framewise_boxes.pkl``, demo.py:382-387) are compared.
This exercises, as one opaque pipeline per side: disk layout + readers
(capture_stream.py:315-529), orientation/gravity, Augmentor/Preprocessor,
the CuTR forward, score filtering, the CLIP label stage (made
decision-neutral, see blackbox_harness), world lift + projection
(demo.py:216-221), both association steps, manager bookkeeping, the
keyframe rule (demo.py:200), and the pickle writers.

WHAT IS ASSERTED -- and why it is statistical here. This CI lane uses a
seeded RANDOM checkpoint (fast).  With random weights the detector's
selection stages (top-300 of 336 anchors, top-100 of 604 query*class
candidates, the score threshold) sit in bands of near-tie scores whose
gaps (~1e-4) are smaller than legitimate cross-implementation float noise
(~1e-3), so the two stacks keep partially DIFFERENT detections and the
worlds diverge by construction, not by bug (measured: ~32% of world boxes
identical, the rest nearby; the module-level activation parity test needs
the same escape hatch, test_reference_parity.py:_assert_detection_set_parity).
The assertions below are therefore calibrated bounds that still catch
every *driver-level* defect this test exists for -- a flipped orientation,
wrong K/depth scale, a missing world transform, or pickle-format drift all
displace/misscale boxes by meters or change counts grossly.

DETERMINISTIC parity on this exact pipeline comes from the companion tool
``tools/run_blackbox_parity.py --trained``: it overfits a checkpoint on the
scene with the product trainer (real-weights score margins >> noise) and
records exact-match results + same-host FPS into REF_CPU_PARITY.json.

The frame count is chosen so the final frame IS a gap multiple: on a
non-multiple final frame the reference re-processes its *stale,
already-world-transformed* detections (demo.py:134 lacks the
``count == len(dataset)-1`` clause that demo.py:200 has -- a
double-transform bug we deliberately do not reproduce; PARITY.md).  The
in-loop last-frame rule itself is reference-driven by
test_reference_sequence_parity.
"""
import os

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = [
    pytest.mark.slow,
    pytest.mark.refparity,
    pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted"),
]

GAP = 7
N_FRAMES = 36  # last index 35 == 5*GAP: keyframe via BOTH demo.py:200 clauses
HW = (192, 256)
SEQ = "42898867"


@pytest.fixture(scope="module")
def blackbox_runs(tmp_path_factory):
    from tests import blackbox_harness as bh

    root = str(tmp_path_factory.mktemp("blackbox"))
    seqdir = os.path.join(root, SEQ)
    bh.write_scene(seqdir, n_frames=N_FRAMES, image_hw=HW)
    ckpt = bh.build_reference_checkpoint(os.path.join(root, "cutr_rand.pth"))
    class_txt, class_pt = bh.write_class_assets(root)

    ref_out = os.path.join(root, "ref_out")
    our_out = os.path.join(root, "our_out")
    os.makedirs(ref_out)
    os.makedirs(our_out)

    ref_cfg = bh.write_config(
        os.path.join(root, "ref.yaml"),
        datadir=os.path.join(root, "_base/"),  # --seq rewrite -> <root>/<SEQ>/
        output_dir=ref_out, gap=GAP, image_hw=HW,
    )
    our_cfg = bh.write_config(
        os.path.join(root, "ours.yaml"),
        datadir=seqdir, output_dir=our_out, gap=GAP, image_hw=HW,
    )

    ref = bh.run_reference_demo(ref_cfg, SEQ, ckpt, class_txt, class_pt)
    ours = bh.run_our_cli(our_cfg, seqdir, ckpt, engine="host",
                          extra=("--class_txt", class_txt))
    return dict(root=root, ref=ref, ours=ours, ref_out=ref_out,
                our_out=our_out)


def _load_pair(runs, name):
    from tests import blackbox_harness as bh

    r = bh.load_corner_pickle(os.path.join(runs["ref_out"], name))
    o = bh.load_corner_pickle(os.path.join(runs["our_out"], name))
    return r, o


def _assert_bounded_world_match(ref, ours, tag):
    """Calibrated statistical bounds (see module docstring)."""
    from tests.blackbox_harness import bounded_match_stats

    assert ref.shape[0] > 0, f"{tag}: reference produced an empty world"
    s = bounded_match_stats(ref, ours)
    msg = f"{tag}: {s}"
    # counts track each other (driver semantics: keyframes, thresholds,
    # filters, last-frame rule)
    assert s["count_rel_diff"] <= 0.15, msg
    # a solid core of detections is box-identical to <5 cm in every corner
    # (same query kept by both stacks): catches coordinate-path drift
    assert s["exact_frac"] >= 0.20, msg
    # every box sits inside the common cluster: catches orientation/
    # world-transform/scale defects, which displace by meters
    assert s["nn_median"] <= 0.30, msg
    assert s["nn_p90"] <= 1.20, msg


def test_world_pickles_match(blackbox_runs):
    ref, ours = _load_pair(blackbox_runs, f"{SEQ}_boxes.pkl")
    _assert_bounded_world_match(ref, ours, "world")


def test_framewise_pickles_match(blackbox_runs):
    ref, ours = _load_pair(blackbox_runs, "framewise_boxes.pkl")
    _assert_bounded_world_match(ref, ours, "framewise")


def test_both_report_fps(blackbox_runs):
    assert blackbox_runs["ref"]["fps"] is not None
    assert blackbox_runs["ours"]["fps"] is not None

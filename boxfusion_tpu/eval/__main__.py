"""Multi-sequence evaluation CLI: fan sequences out over TPU devices.

Capability target: the reference's batch-eval workflow (one demo.py run per
val.txt sequence with skip-if-exists resume, demo.py:434-436) as one command:

  python -m boxfusion_tpu.eval --config config/ca1m.yaml \
      --data-root /data/ca1m --seq-list data/val.txt \
      --model-path cutr_rgbd.pth --output-dir out/

Plus a dataset-free self-evaluation mode that the reference cannot offer
(its eval code is unreleased, reference README.md:23): ``--synthetic N``
runs the oracle pipeline over N synthetic scenes with closed-form GT and
reports 3D AP@0.25 / AP@0.5 -- the end-to-end proof that the evaluator,
fan-out runner, and pipeline agree:

  python -m boxfusion_tpu.eval --config config/ca1m.yaml --synthetic 5
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _run_synthetic(cfg, n_seqs: int, capacity: int) -> int:
    """Oracle pipeline vs synthetic GT over ``n_seqs`` sequences -> AP."""
    import jax.numpy as jnp

    from boxfusion_tpu.data.synthetic import OracleDetector, SyntheticSequence
    from boxfusion_tpu.eval.runner import evaluate_sequences
    from boxfusion_tpu.geometry.boxes import box_corners

    # the oracle scene defines its own filter profile: no uv/floor rejection
    # (its GT boxes may sit near image borders) and the bundled PST fallback.
    cfg["detection"]._data["score_thresh"] = 0.3
    cfg["detection"]._data["uv_bound"] = False
    cfg["detection"]._data["floor_mask"] = False
    cfg["box_fusion"]._data["pst_path"] = None

    seqs = [
        SyntheticSequence(n_frames=60, n_boxes=6, seed=s, video_id=f"synth{s}")
        for s in range(n_seqs)
    ]

    def gt_provider(seq):
        return np.asarray(
            box_corners(jnp.asarray(seq.gt_xyzlhw), jnp.asarray(seq.gt_R))
        )

    out = evaluate_sequences(
        cfg,
        seqs,
        detector_factory=lambda s: OracleDetector(s, noise=0.02, seed=1),
        gt_provider=gt_provider,
        capacity=capacity,
    )
    print(
        f"[eval] synthetic self-eval over {n_seqs} sequences: "
        f"AP@0.25 = {out['ap_0.25']['ap']:.4f}  "
        f"AP@0.50 = {out['ap_0.50']['ap']:.4f}  "
        f"(mean FPS {out['mean_fps']:.2f})"
    )
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="boxfusion-tpu-eval", description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--data-root", default=None, help="directory of sequence dirs")
    p.add_argument("--seq-list", default=None, help="txt file of sequence ids (val.txt)")
    p.add_argument("--model-path", default=None)
    p.add_argument("--dimension", default=768, type=int)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--capacity", default=512, type=int)
    p.add_argument(
        "--synthetic", default=0, type=int, metavar="N",
        help="dataset-free mode: oracle pipeline over N synthetic GT scenes -> AP",
    )
    p.add_argument(
        "--fused", action="store_true",
        help="single-dispatch fused keyframe engine (one upload + one "
        "execute per keyframe; fastest on remote-attached chips)",
    )
    p.add_argument(
        "--lanes", default=None, type=int, metavar="N",
        help="single-chip batched mode: run N sequences in lockstep through "
        "one vmapped pipeline (MXU batching; sequences must share one "
        "resolution bucket). Mutually exclusive with --fused.",
    )
    p.add_argument(
        "--packed", action="store_true",
        help="with --lanes: packed byte transport, ONE (N, L) upload + ONE "
        "dispatch per keyframe round (fastest on remote-attached chips)",
    )
    p.add_argument(
        "--gt", action="store_true",
        help="score 3D AP@0.25/0.5 against each sequence's "
        "after_filter_boxes.npy (the GT-filter output, reference "
        "data_process/filter_gt_boxes.py:144-152) -- the real-data "
        "equivalent of --synthetic's closed-form AP",
    )
    p.add_argument("--clip-path", default=None,
                   help="CLIP weights: enables open-vocab labeling in-eval")
    p.add_argument("--class_txt", default="./data/panoptic_categories_nomerge.txt")
    p.add_argument("--class_features", default="./data/class_features.pt")
    p.add_argument(
        "--video-ids", nargs="+", default=None,
        help="subset of sequence ids to run (reference demo.py:403)",
    )
    args = p.parse_args(argv)

    from boxfusion_tpu.data import get_dataset
    from boxfusion_tpu.eval.runner import evaluate_sequences
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config(args.config)

    if args.fused and args.lanes is not None:
        p.error("--fused and --lanes are mutually exclusive")
    if args.lanes is not None and args.lanes < 1:
        p.error(f"--lanes must be >= 1 (got {args.lanes})")
    if args.packed and args.lanes is None:
        p.error("--packed requires --lanes N")
    if args.synthetic:
        if args.fused or args.lanes is not None:
            p.error(
                "--fused/--lanes need a CuTR detector; --synthetic uses the "
                "oracle detector (drop the flag, or run on real data)"
            )
        return _run_synthetic(cfg, args.synthetic, args.capacity)
    if not args.data_root:
        p.error("--data-root is required unless --synthetic N is given")

    if args.seq_list:
        from boxfusion_tpu.utils.config import read_lines

        seq_ids = read_lines(args.seq_list)
    else:
        seq_ids = sorted(
            d for d in os.listdir(args.data_root)
            if os.path.isdir(os.path.join(args.data_root, d))
        )
    if args.video_ids:
        wanted = set(map(str, args.video_ids))
        seq_ids = [s for s in seq_ids if str(s) in wanted]
        missing = wanted - set(map(str, seq_ids))
        if missing:
            source = (
                f"--seq-list {args.seq_list}" if args.seq_list else "--data-root"
            )
            print(
                f"[eval] --video-ids not in {source}: {sorted(missing)}",
                file=sys.stderr,
            )
            return 1
    if not seq_ids:
        print("[eval] no sequences found", file=sys.stderr)
        return 1

    def make_seq(seq_id):
        c = load_config(args.config)
        c["data"]["datadir"] = os.path.join(args.data_root, str(seq_id))
        ds = get_dataset(c)
        ds.video_id = str(seq_id)
        return ds

    from types import SimpleNamespace

    import jax
    import numpy as np

    from boxfusion_tpu.cli import _build_cutr_detector
    from boxfusion_tpu.runtime.detector import CuTRDetector

    # open-vocab labeling (same assets/flags as the main CLI, demo.py:458-461).
    # Requires explicit --clip-path: asset presence alone must not silently
    # enable a RANDOM image tower against real text features (every box
    # would sink into the background column and AP would read 0).
    labeler = None
    wants_label = bool(args.clip_path)
    if not wants_label and os.path.exists(args.class_features) and os.path.exists(
        args.class_txt
    ):
        print(
            "[eval] class assets present but --clip-path not given; "
            "open-vocab labeling disabled"
        )
    if wants_label:
        try:
            from boxfusion_tpu.models.clip import build_labeler

            labeler = build_labeler(
                args.clip_path, args.class_txt, args.class_features,
                sim_thres=float(cfg["detection"]["class_sim_thres"]),
            )
        except Exception as e:  # noqa: BLE001
            print(f"[eval] open-vocab labeling disabled: {e}")
    if labeler is not None and args.lanes is not None and not args.packed:
        p.error("labeling with --lanes requires --packed (the label stage is "
                "traced into the packed program)")

    # real-data GT: (K, 8, 3) world corners from the offline GT filter
    # (same file layout the reference's filter_gt_boxes.py writes)
    gt_provider = None
    if args.gt:
        missing = [
            s for s in seq_ids
            if not os.path.exists(
                os.path.join(args.data_root, str(s), "after_filter_boxes.npy")
            )
        ]
        if missing:
            print(
                f"[eval] --gt: after_filter_boxes.npy missing for {len(missing)} "
                f"sequence(s) (first: {missing[0]}); produce it with "
                "python -m boxfusion_tpu.data_process filter-gt",
                file=sys.stderr,
            )
            return 1

        def gt_provider(seq):
            base = seq.cfg["data"]["datadir"]
            path = os.path.join(base, "after_filter_boxes.npy")
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"--gt: {path} not found; produce it with "
                    "python -m boxfusion_tpu.data_process filter-gt"
                )
            corners = np.load(path).astype(np.float32)
            if corners.ndim != 3 or corners.shape[1:] != (8, 3):
                raise ValueError(
                    f"--gt: {path} has shape {corners.shape}, expected (K, 8, 3)"
                )
            # class labels (written by gt-filter when instances.json carries
            # categories) enable per-class mAP against the open-vocab labels
            lbl_path = os.path.join(base, "after_filter_labels.npy")
            if os.path.exists(lbl_path):
                labels = np.load(lbl_path, allow_pickle=False)
                if len(labels) != len(corners):
                    raise ValueError(
                        f"--gt: {lbl_path} has {len(labels)} labels for "
                        f"{len(corners)} boxes"
                    )
                return dict(corners=corners, classes=labels)
            return corners

    det_args = SimpleNamespace(
        model_path=args.model_path, dimension=args.dimension
    )
    # export_image: the device-resident label path crops the on-device image
    det0 = _build_cutr_detector(
        det_args, cfg, device_output=True,
        export_image=labeler is not None and args.lanes is None and not args.fused,
    )
    # keep the weights host-side so each sequence's detector places them on
    # the runner's round-robin device (committed device arrays would pin all
    # compute to the device the checkpoint was loaded on).
    params_host = jax.tree_util.tree_map(np.asarray, det0.params)

    def detector_factory(seq):
        # The runner calls this under jax.default_device(dev): upload the
        # checkpoint once per sequence, not once per jitted keyframe call.
        params_dev = jax.device_put(params_host)
        return CuTRDetector(det0.model, params_dev, device_output=True)

    if args.lanes is not None:
        from boxfusion_tpu.eval.runner import evaluate_sequences_batched

        out = evaluate_sequences_batched(
            cfg,
            (make_seq(s) for s in seq_ids),
            detector=CuTRDetector(det0.model, jax.device_put(params_host)),
            lanes=args.lanes,
            output_dir=args.output_dir,
            capacity=args.capacity,
            packed=args.packed,
            depth_scale=float(cfg["cam"]["png_depth_scale"]),
            labeler=labeler,
            gt_provider=gt_provider,
        )
    else:
        out = evaluate_sequences(
            cfg,
            (make_seq(s) for s in seq_ids),  # lazy: one dataset at a time
            detector_factory=detector_factory,
            output_dir=args.output_dir,
            capacity=args.capacity,
            fused=args.fused,
            depth_scale=float(cfg["cam"]["png_depth_scale"]),
            labeler=labeler,
            gt_provider=gt_provider,
        )
    print(
        f"[eval] {len(out['sequences'])} sequences in {out['wall_s']:.1f}s, "
        f"mean FPS {out['mean_fps']:.2f}"
    )
    if "ap_0.25" in out:
        print(
            f"[eval] 3D AP@0.25 = {out['ap_0.25']['ap']:.4f}  "
            f"AP@0.50 = {out['ap_0.50']['ap']:.4f}  "
            f"(n_pred {out['ap_0.25']['n_pred']}, n_gt {out['ap_0.25']['n_gt']})"
        )
    if "map_0.25" in out:
        n_cls = sum(
            1 for m in out["map_0.25"]["per_class"].values() if m["n_gt"] > 0
        )
        print(
            f"[eval] per-class mAP@0.25 = {out['map_0.25']['map']:.4f} "
            f"over {n_cls} classes with GT"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

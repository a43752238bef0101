"""Multi-sequence evaluation CLI: fan sequences out over TPU devices.

Capability target: the reference's batch-eval workflow (one demo.py run per
val.txt sequence with skip-if-exists resume, demo.py:434-436) as one command:

  python -m boxfusion_tpu.eval --config config/ca1m.yaml \
      --data-root /data/ca1m --seq-list data/val.txt \
      --model-path cutr_rgbd.pth --output-dir out/
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="boxfusion-tpu-eval", description=__doc__)
    p.add_argument("--config", required=True)
    p.add_argument("--data-root", required=True, help="directory of sequence dirs")
    p.add_argument("--seq-list", default=None, help="txt file of sequence ids (val.txt)")
    p.add_argument("--model-path", default=None)
    p.add_argument("--dimension", default=768, type=int)
    p.add_argument("--output-dir", default=None)
    p.add_argument("--capacity", default=512, type=int)
    args = p.parse_args(argv)

    from boxfusion_tpu.data import get_dataset
    from boxfusion_tpu.eval.runner import evaluate_sequences
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config(args.config)

    if args.seq_list:
        from boxfusion_tpu.utils.config import read_lines

        seq_ids = read_lines(args.seq_list)
    else:
        seq_ids = sorted(
            d for d in os.listdir(args.data_root)
            if os.path.isdir(os.path.join(args.data_root, d))
        )
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

    det_args = SimpleNamespace(
        model_path=args.model_path, dimension=args.dimension
    )
    det0 = _build_cutr_detector(det_args, cfg, device_output=True)
    # keep the weights host-side so each sequence's detector places them on
    # the runner's round-robin device (committed device arrays would pin all
    # compute to the device the checkpoint was loaded on).
    params_host = jax.tree_util.tree_map(np.asarray, det0.params)

    out = evaluate_sequences(
        cfg,
        (make_seq(s) for s in seq_ids),  # lazy: one dataset at a time
        detector_factory=lambda seq: CuTRDetector(
            det0.model, params_host, device_output=True
        ),
        output_dir=args.output_dir,
        capacity=args.capacity,
    )
    print(
        f"[eval] {len(out['sequences'])} sequences in {out['wall_s']:.1f}s, "
        f"mean FPS {out['mean_fps']:.2f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Training-loop driver: ``python -m boxfusion_tpu.train``.

The reference ships no trainer at all (inference-only release; its README
lists training/eval as unreleased, README.md:23).  This driver closes that
gap the TPU way: one jitted train step sharded over a (dp, fsdp, tp)
``jax.sharding.Mesh`` (parallel/mesh.py), warmup+cosine LR via optax, and
orbax parameter checkpoints.

Data: the synthetic oracle-supervised workload by default — frames
rendered by ``SyntheticSequence`` with targets derived from its
closed-form GT boxes through the same camera model the detector predicts
in (camera-frame center/dims/pose + projected 2D boxes).  ``--data-root``
switches to a REAL CA-1M-layout sequence dir: frames come from the CA-1M
reader and targets from the sequence's world-corner GT
(``after_filter_boxes.npy``, the data_process filter-gt output),
transformed per keyframe into the model's prediction frame.

Run (any device count; B must be divisible by the mesh's dp*fsdp):

    python -m boxfusion_tpu.train --steps 200 --batch 8 --dim 192

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python -m boxfusion_tpu.train --steps 20 --batch 8 --platform cpu
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def _frame_targets(seq, frame, G: int) -> dict:
    """Closed-form supervision for one synthetic frame.

    Uses the oracle's noise-free detection of the sequence GT
    (data/synthetic.py:124-175) and converts to the loss's target layout
    (train/loss.py:46-60): cxcywh 2D boxes, camera-frame proj_xy/z/dims/pose,
    padded to G slots with a validity mask.
    """
    from boxfusion_tpu.data.synthetic import OracleDetector

    det = OracleDetector(seq, noise=0.0)(frame)
    n = min(len(det["scores"]), G)
    boxes2d = np.zeros((G, 4), np.float32)
    proj_xy = np.zeros((G, 2), np.float32)
    z = np.full((G, 1), 1.0, np.float32)
    dims = np.full((G, 3), 0.1, np.float32)
    pose = np.tile(np.eye(3, dtype=np.float32)[None], (G, 1, 1))
    mask = np.zeros((G,), np.float32)
    if n:
        xyxy = det["pred_boxes"][:n]
        boxes2d[:n, :2] = (xyxy[:, :2] + xyxy[:, 2:]) * 0.5
        boxes2d[:n, 2:] = xyxy[:, 2:] - xyxy[:, :2]
        proj_xy[:n] = det["proj_xy"][:n]
        z[:n, 0] = det["boxes3d"][:n, 2]
        # the supervised head emits dims as (w, h, l); exported boxes3d is
        # LHW (model.py reorders with (2, 1, 0) at inference) -- targets
        # must be in the HEAD's order or the loss swaps length and width
        dims[:n] = det["boxes3d"][:n, 3:][:, (2, 1, 0)]
        pose[:n] = det["R"][:n]  # synthetic T_gravity is identity, so the
        # exported R equals the head's pre-gravity output
        mask[:n] = 1.0
    return dict(boxes2d=boxes2d, proj_xy=proj_xy, z=z, dims=dims, pose=pose, mask=mask)


def _targets_from_world_corners(corners_world: np.ndarray, frame, G: int) -> dict:
    """Supervision for one real posed frame from world-corner GT.

    ``corners_world`` is the (K, 8, 3) layout of
    ``after_filter_boxes.npy`` (data_process/gt_filter.py; reference
    filter_gt_boxes.py:144-153).  Boxes are moved to the camera frame,
    visibility-filtered with the oracle's thresholds (center z in
    (0.3, 8.0) and projected center in-bounds), and converted to the
    loss's target layout -- pose gravity-aligned exactly like the model's
    own outputs (models/cutr/model.py, reference
    cubify_transformer.py:991-992).
    """
    from boxfusion_tpu.geometry.boxes import corners_to_params

    P = np.asarray(frame.gt_pose, np.float32)
    Rp, t = P[:3, :3], P[:3, 3]
    cam = (corners_world.astype(np.float32) - t) @ Rp  # R^T (c - t) per corner

    xyzlhw, R_cam = (np.asarray(a) for a in corners_to_params(cam))
    K = np.asarray(frame.K, np.float32)
    h, w = frame.image.shape[:2]
    z = xyzlhw[:, 2]
    u = K[0, 0] * xyzlhw[:, 0] / np.maximum(z, 1e-6) + K[0, 2]
    v = K[1, 1] * xyzlhw[:, 1] / np.maximum(z, 1e-6) + K[1, 2]
    visible = (z > 0.3) & (z < 8.0) & (u > 0) & (u < w) & (v > 0) & (v < h)

    cam_v = cam[visible]
    xyzlhw, R_cam = xyzlhw[visible], R_cam[visible]
    u, v, z = u[visible], v[visible], z[visible]
    n = min(len(xyzlhw), G)

    boxes2d = np.zeros((G, 4), np.float32)
    proj_xy = np.zeros((G, 2), np.float32)
    z_t = np.full((G, 1), 1.0, np.float32)
    dims = np.full((G, 3), 0.1, np.float32)
    pose = np.tile(np.eye(3, dtype=np.float32)[None], (G, 1, 1))
    mask = np.zeros((G,), np.float32)
    if n:
        cz = np.maximum(cam_v[:n, :, 2], 1e-6)
        cu = np.clip(K[0, 0] * cam_v[:n, :, 0] / cz + K[0, 2], 0, w)
        cv = np.clip(K[1, 1] * cam_v[:n, :, 1] / cz + K[1, 2], 0, h)
        x0, x1 = cu.min(-1), cu.max(-1)
        y0, y1 = cv.min(-1), cv.max(-1)
        boxes2d[:n] = np.stack(
            [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], -1
        )
        proj_xy[:n] = np.stack([u[:n], v[:n]], -1)
        z_t[:n, 0] = z[:n]
        # head dims order is (w, h, l); corners_to_params returns (l, h, w)
        dims[:n] = xyzlhw[:n, 3:][:, (2, 1, 0)]
        # inference exports R = T_gravity @ pose_head (model.py, reference
        # cubify_transformer.py:991-992), so the HEAD's target for a
        # camera-frame GT rotation is T_gravity^T @ R_cam -- supervising
        # with Tg @ R_cam would make a converged model export Tg^2 @ R_cam
        Tg = np.asarray(frame.T_gravity, np.float32)
        pose[:n] = np.einsum("ji,gjk->gik", Tg, R_cam[:n])
        mask[:n] = 1.0
    return dict(boxes2d=boxes2d, proj_xy=proj_xy, z=z_t, dims=dims,
                pose=pose, mask=mask)


def _build_dataset_ca1m(args):
    """Real-data epoch: a CA-1M-layout sequence dir + world-corner GT.

    Mirrors ``_build_dataset``'s return contract; frames share the
    sequence's single resolution bucket so stacking is shape-safe.
    """
    import os

    import jax

    from boxfusion_tpu.data import get_dataset
    from boxfusion_tpu.data.preprocess import Preprocessor
    from boxfusion_tpu.utils.config import load_config

    cfg = load_config(args.train_config)
    cfg["data"]["datadir"] = args.data_root
    gt_path = os.path.join(args.data_root, args.gt_file)
    corners = np.load(gt_path)
    if corners.ndim != 3 or corners.shape[1:] != (8, 3):
        raise SystemExit(
            f"{gt_path}: expected (K, 8, 3) world corners "
            f"(after_filter_boxes.npy layout), got {corners.shape}"
        )
    gap = args.gap if args.gap else int(cfg["data"]["gap"])

    prep = Preprocessor()
    frames, targets = [], []
    for i, frame in enumerate(get_dataset(cfg)):
        if i % gap:
            continue
        depth = frame.depth
        if args.depth_ratio > 1 and depth is not None:
            depth = depth[:: args.depth_ratio, :: args.depth_ratio]
        fb, _, _ = prep(frame.image, depth, frame.K, frame.T_gravity)
        frames.append(jax.tree.map(np.asarray, fb))
        targets.append(_targets_from_world_corners(corners, frame, args.n_boxes))
    if not frames:
        raise SystemExit(f"no keyframes read from {args.data_root} (gap {gap})")
    return frames, targets


def _build_dataset(args):
    """Materialize the epoch: (FrameBatch leaves stacked host-side, targets).

    Returns (frames_np: list of per-frame FrameBatch, targets_np: list of
    per-frame target dicts).  Frames share one pad bucket (constant synthetic
    resolution) so stacking is shape-safe.
    """
    import jax

    from boxfusion_tpu.data.preprocess import Preprocessor
    from boxfusion_tpu.data.synthetic import SyntheticSequence

    h = int(args.image_size * 3 / 4)
    w = int(args.image_size)
    prep = Preprocessor()
    frames, targets = [], []
    for s in range(args.n_sequences):
        seq = SyntheticSequence(
            n_frames=args.frames_per_seq, n_boxes=args.n_boxes,
            image_hw=(h, w), seed=args.seed + s,
        )
        for frame in seq:
            depth = frame.depth
            if args.depth_ratio > 1:
                depth = depth[:: args.depth_ratio, :: args.depth_ratio]
            fb, _, _ = prep(frame.image, depth, frame.K, frame.T_gravity)
            frames.append(jax.tree.map(np.asarray, fb))
            targets.append(_frame_targets(seq, frame, args.n_boxes))
    return frames, targets


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dim", type=int, default=192)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--depth-ratio", type=int, default=4, choices=(1, 2, 4))
    ap.add_argument("--n-sequences", type=int, default=2)
    ap.add_argument("--frames-per-seq", type=int, default=8)
    ap.add_argument("--n-boxes", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--weight-decay", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-root", type=str, default=None,
                    help="train on a real CA-1M-layout sequence dir (with "
                         "world-corner GT, see --gt-file) instead of the "
                         "synthetic oracle workload")
    ap.add_argument("--train-config", type=str, default="config/ca1m.yaml",
                    help="dataset config for --data-root mode")
    ap.add_argument("--gt-file", type=str, default="after_filter_boxes.npy",
                    help="GT world corners (K, 8, 3) inside --data-root "
                         "(data_process filter-gt output)")
    ap.add_argument("--gap", type=int, default=0,
                    help="keyframe stride for --data-root mode (0 = config)")
    ap.add_argument("--log-every", type=int, default=10)
    ap.add_argument("--ckpt-dir", type=str, default=None)
    ap.add_argument("--ckpt-every", type=int, default=100)
    ap.add_argument("--resume", type=str, default=None,
                    help="params to warm-start from: an orbax checkpoint "
                         "dir, or the reference's cutr_rgbd.pth (fine-tune)")
    ap.add_argument("--platform", type=str, default=None,
                    help="jax platform override, e.g. cpu (with "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                         "for a virtual mesh)")
    args = ap.parse_args(argv)

    import jax

    # Hosts whose sitecustomize pre-registers an accelerator backend ignore
    # a late JAX_PLATFORMS env var, so platform choice rides an explicit CLI
    # flag, applied through jax.config before any computation.  When absent,
    # whatever the process already selected (ambient default, or the test
    # conftest's cpu mesh) stands.
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import optax

    from boxfusion_tpu.models.cutr import make_cutr
    from boxfusion_tpu.parallel import make_mesh, shard_train_step
    from boxfusion_tpu.train.step import init_train_state, make_train_step
    from boxfusion_tpu.utils.checkpoint import restore_params, save_params

    mesh = make_mesh(len(jax.devices()))
    dp_total = mesh.shape["dp"] * mesh.shape["fsdp"]
    if args.batch % dp_total:
        raise SystemExit(
            f"--batch {args.batch} must be divisible by dp*fsdp={dp_total} "
            f"(mesh {dict(mesh.shape)})"
        )

    print(f"mesh {dict(mesh.shape)} | batch {args.batch} | dim {args.dim}")
    if args.data_root:
        frames, targets = _build_dataset_ca1m(args)
    else:
        frames, targets = _build_dataset(args)
    n_frames = len(frames)
    print(f"dataset: {n_frames} frames, {args.n_boxes} GT slots/frame")

    model = make_cutr(dimension=args.dim, depth_model=True)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=args.lr, warmup_steps=args.warmup,
        decay_steps=max(args.steps, args.warmup + 1), end_value=args.lr * 0.01,
    )
    train_step, tx = make_train_step(
        model, learning_rate=schedule, weight_decay=args.weight_decay
    )

    def stack(batch_frames):
        return jax.tree.map(lambda *xs: np.concatenate(xs, axis=0), *batch_frames)

    def stack_targets(batch_targets):
        return {
            k: np.stack([t[k] for t in batch_targets]) for k in batch_targets[0]
        }

    # sample with replacement exactly like the training loop: slicing
    # frames[:batch] on a short dataset would build an undersized example,
    # compiling the sharded step twice (and breaking dp divisibility).
    ex_idx = np.arange(args.batch) % n_frames
    ex_batch = stack([frames[i] for i in ex_idx])
    ex_targets = {
        k: jnp.asarray(v)
        for k, v in stack_targets([targets[i] for i in ex_idx]).items()
    }

    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), ex_batch)
    if args.resume:
        if args.resume.endswith((".pth", ".pt")):
            # fine-tune from the reference's torch checkpoint (demo.py:441)
            from boxfusion_tpu.models.cutr.convert import load_checkpoint

            params, ckpt_dim, ckpt_depth = load_checkpoint(args.resume)
            if not ckpt_depth:
                raise SystemExit(
                    "--resume checkpoint is an RGB-only CuTR; the training "
                    "loop currently targets the RGB-D model"
                )
            if ckpt_dim != args.dim:
                raise SystemExit(
                    f"--resume checkpoint is dim {ckpt_dim} but --dim is "
                    f"{args.dim}; pass --dim {ckpt_dim}"
                )
        else:
            params = restore_params(args.resume, template=params)
        print(f"resumed params from {args.resume}")
    state = init_train_state(params, tx)

    jitted, state, _, _ = shard_train_step(train_step, mesh, state, ex_batch, ex_targets)

    rng = np.random.RandomState(args.seed + 99)
    t0 = time.perf_counter()
    loss = float("nan")
    for step in range(1, args.steps + 1):
        idx = rng.choice(n_frames, size=args.batch, replace=n_frames < args.batch)
        fb = stack([frames[i] for i in idx])
        tg = stack_targets([targets[i] for i in idx])
        state, metrics = jitted(state, fb, tg)
        if step % args.log_every == 0 or step == args.steps:
            loss = float(metrics["loss"])  # sync point, intentionally sparse
            dt = time.perf_counter() - t0
            print(
                f"step {step:6d} | loss {loss:9.4f} | lr {schedule(step):.2e} "
                f"| {step / dt:6.2f} steps/s"
            )
        if args.ckpt_dir and (step % args.ckpt_every == 0 or step == args.steps):
            path = f"{args.ckpt_dir}/step_{step:07d}"
            save_params(path, jax.device_get(state.params))
            print(f"saved {path}")
    assert np.isfinite(loss), f"training diverged: loss={loss}"


if __name__ == "__main__":
    main()

"""Build the committed deterministic-parity fixture checkpoint.

Reproduces the round-4 trained regime (REF_CPU_PARITY.json.trained_regime:
equal world counts 34=34, 70.6% corner-exact, median drift 1.3 cm) as a
CI-reproducible artifact: overfit CuTR dim-192 on the black-box scene with
the product trainer using the staged schedule the r4 record documents
(300 steps @ lr 1e-3 + 1000 @ 5e-4 + 400 @ 2e-4, batch 2, gap 1), then
export to ``tests/fixtures/cutr_trained_192.pth`` (reference checkpoint
format, demo.py:441 strict torch load).

tools/run_blackbox_parity.py picks the fixture up by default, so the
recorded parity regime is the deterministic one without re-training.

Run: python tools/build_parity_fixture.py [--workdir D] [--platform cpu|tpu]
(Training the 1700 steps takes ~25-60 min on this host's single CPU; the
attached TPU finishes in a few minutes -- weight VALUES differ per backend
but the fixture is committed bytes, so reproducibility is by artifact.)
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

STAGES = ((300, 1e-3), (1000, 5e-4), (400, 2e-4))  # r4 protocol
DIM = 192
BATCH = 2
FIXTURE = os.path.join(REPO, "tests", "fixtures", "cutr_trained_192.pth")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--workdir", default="/tmp/parity_fixture")
    ap.add_argument("--platform", default=None,
                    help="jax platform for training (default: whatever is "
                         "attached; pass cpu to force the hermetic backend)")
    ap.add_argument("--out", default=FIXTURE)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args(argv)

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from boxfusion_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import torch

    from tests import blackbox_harness as bh

    from boxfusion_tpu.models.cutr import FrameBatch, make_cutr
    from boxfusion_tpu.models.cutr.convert import flax_to_torch_template
    from boxfusion_tpu.train.__main__ import main as train_main
    from boxfusion_tpu.utils.checkpoint import restore_params

    if not args.keep and os.path.isdir(args.workdir):
        shutil.rmtree(args.workdir)
    os.makedirs(args.workdir, exist_ok=True)
    seqdir = os.path.join(args.workdir, "42898867")
    if not os.path.isdir(seqdir):
        bh.write_scene(seqdir, n_frames=36, image_hw=(192, 256))
    cfg_path = bh.write_config(
        os.path.join(args.workdir, "train.yaml"), datadir=seqdir,
        output_dir=os.path.join(args.workdir, "unused"), gap=7,
        image_hw=(192, 256),
    )

    ckpt_dir = os.path.join(args.workdir, "train_ckpt")
    resume = None
    total = 0
    for steps, lr in STAGES:
        total += steps
        t0 = time.time()
        argv_train = [
            "--steps", str(steps), "--batch", str(BATCH), "--dim", str(DIM),
            "--seed", "0", "--lr", str(lr),
            "--data-root", seqdir, "--train-config", cfg_path,
            "--gap", "1", "--depth-ratio", "1",
            "--ckpt-dir", ckpt_dir, "--ckpt-every", str(10 ** 9),
            "--log-every", str(max(1, steps // 4)),
        ]
        if resume:
            argv_train += ["--resume", resume]
        train_main(argv_train)
        resume = os.path.join(ckpt_dir, f"step_{steps:07d}")
        print(f"[fixture] stage {steps}@{lr}: {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)

    # export through the product converter into the reference .pth format
    import jax.numpy as jnp

    model = make_cutr(dimension=DIM, depth_model=True)
    tmpl_batch = FrameBatch(
        image=jnp.zeros((1, 256, 256, 3)),
        depth=jnp.zeros((1, 256, 256, 1)),
        K=jnp.eye(3)[None] * 100,
        image_hw=jnp.asarray([[192.0, 256.0]]),
        depth_params=jnp.ones((1, 2)),
        T_gravity=jnp.eye(3)[None],
    )
    template = jax.jit(model.init)(jax.random.PRNGKey(0), tmpl_batch)
    params = restore_params(resume, template=template)
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(np.asarray(v, np.float32)))
        for k, v in flax_to_torch_template(params).items()
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    torch.save({"model": sd}, args.out)
    print(f"[fixture] wrote {args.out} "
          f"({os.path.getsize(args.out) / 1e6:.1f} MB, {total} steps)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

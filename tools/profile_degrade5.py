"""cProfile the poisoned tiny-op dispatch; bisect step features."""
import cProfile
import io
import pstats
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

sys.stdout = open("/tmp/probe5_out.txt", "w", buffering=1)

N = 30


def tiny_stats(tag):
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    jax.block_until_ready(tiny(x))
    # dispatch-only (block at end)
    t0 = time.perf_counter()
    for _ in range(N):
        x2 = tiny(x)
    jax.block_until_ready(x2)
    pipelined = (time.perf_counter() - t0) / N * 1000
    # per-call sync
    t0 = time.perf_counter()
    for _ in range(N):
        jax.block_until_ready(tiny(x))
    sync = (time.perf_counter() - t0) / N * 1000
    print(f"[{tag}] tiny pipelined={pipelined:.3f} sync={sync:.3f} ms", flush=True)
    return pipelined


tiny_stats("baseline")

# trigger: the keyframe step WITHOUT fusion (fusion_use=False)
from boxfusion_tpu.fusion import load_pst
from boxfusion_tpu.runtime.device_state import init_state
from boxfusion_tpu.runtime.device_step import META_WIDTH, StepConfig, keyframe_step_devdet

scfg = StepConfig(score_thresh=0.0, uv_bound=False, floor_mask=False,
                  size_max_thres=0.0, fusion_use=False)
state = init_state(capacity=512, max_views=10, obs_capacity=4096)
pst = jnp.asarray(load_pst(None, 1024))
rng = np.random.RandomState(0)

def fake_det(n=100):
    return {
        "scores": jnp.asarray(rng.rand(n).astype(np.float32)),
        "pred_boxes": jnp.asarray((rng.rand(n, 4) * 200).astype(np.float32)),
        "boxes3d": jnp.asarray(np.concatenate([rng.randn(n, 3), rng.rand(n, 3) * 0.5 + 0.2], 1).astype(np.float32)),
        "R": jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (n, 1, 1)),
        "proj_xy": jnp.asarray((rng.rand(n, 2) * 200).astype(np.float32)),
    }

meta = np.zeros(META_WIDTH, np.float32)
meta[:16] = np.eye(4, dtype=np.float32).ravel()
meta[16:25] = np.asarray([[200, 0, 128], [0, 200, 96], [0, 0, 1]], np.float32).ravel()
meta[25:34] = meta[16:25]
meta[34:36] = (192, 256)

state = keyframe_step_devdet(state, fake_det(), jax.device_put(meta), pst, scfg, 100)
jax.block_until_ready(state.n)
tiny_stats("after 1 step (fusion OFF)")

meta2 = meta.copy(); meta2[:16] = np.asarray(
    [[1,0,0,0.5],[0,1,0,0],[0,0,1,0],[0,0,0,1]], np.float32).ravel()
meta2[36] = 20
state = keyframe_step_devdet(state, fake_det(), jax.device_put(meta2), pst, scfg, 100)
jax.block_until_ready(state.n)
ms = tiny_stats("after 2 steps (fusion OFF)")

if ms > 0.5:
    # profile the poisoned dispatch
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    jax.block_until_ready(tiny(x))
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(50):
        x2 = tiny(x)
    jax.block_until_ready(x2)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(18)
    print(s.getvalue(), flush=True)

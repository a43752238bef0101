"""Upload strategies in the poisoned state: direct-np args, threaded puts."""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

sys.stdout = open("/tmp/probe6_out.txt", "w", buffering=1)

from boxfusion_tpu.fusion import load_pst
from boxfusion_tpu.runtime.device_state import init_state
from boxfusion_tpu.runtime.device_step import META_WIDTH, StepConfig, keyframe_step_devdet

N = 20
img = np.random.randint(0, 255, (384, 512, 3), np.uint8)
dep = np.random.rand(384, 512).astype(np.float32)


def poison():
    scfg = StepConfig(score_thresh=0.0, uv_bound=False, floor_mask=False,
                      size_max_thres=0.0, fusion_use=False)
    state = init_state(capacity=512, max_views=10, obs_capacity=4096)
    pst = jnp.asarray(load_pst(None, 1024))
    rng = np.random.RandomState(0)
    det = {
        "scores": jnp.asarray(rng.rand(100).astype(np.float32)),
        "pred_boxes": jnp.asarray((rng.rand(100, 4) * 200).astype(np.float32)),
        "boxes3d": jnp.asarray(np.concatenate([rng.randn(100, 3), rng.rand(100, 3) * 0.5 + 0.2], 1).astype(np.float32)),
        "R": jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (100, 1, 1)),
        "proj_xy": jnp.asarray((rng.rand(100, 2) * 200).astype(np.float32)),
    }
    meta = np.zeros(META_WIDTH, np.float32)
    meta[:16] = np.eye(4, dtype=np.float32).ravel()
    meta[16:25] = np.asarray([[200, 0, 128], [0, 200, 96], [0, 0, 1]], np.float32).ravel()
    meta[25:34] = meta[16:25]
    meta[34:36] = (192, 256)
    state = keyframe_step_devdet(state, det, jax.device_put(meta), pst, scfg, 100)
    jax.block_until_ready(state.n)
    return state


def put_ms(tag):
    t0 = time.perf_counter()
    for _ in range(N):
        r = jax.device_put((img, dep))
    jax.block_until_ready(r)
    print(f"[{tag}] device_put pair: {(time.perf_counter()-t0)/N*1000:7.2f} ms", flush=True)


def jit_np_ms(tag):
    f = jax.jit(lambda a, b: (a.astype(jnp.float32).sum() + b.sum()))
    jax.block_until_ready(f(img, dep))
    t0 = time.perf_counter()
    for _ in range(N):
        out = f(img, dep)
    jax.block_until_ready(out)
    print(f"[{tag}] jit(np args):    {(time.perf_counter()-t0)/N*1000:7.2f} ms", flush=True)


def threaded_put_ms(tag, workers=4):
    ex = ThreadPoolExecutor(max_workers=workers)
    t0 = time.perf_counter()
    futs = [ex.submit(jax.device_put, (img, dep)) for _ in range(N)]
    rs = [f.result() for f in futs]
    jax.block_until_ready(rs[-1])
    print(f"[{tag}] device_put x{workers} threads: {(time.perf_counter()-t0)/N*1000:7.2f} ms", flush=True)
    ex.shutdown()


put_ms("baseline")
jit_np_ms("baseline")
threaded_put_ms("baseline")

state = poison()

put_ms("poisoned")
jit_np_ms("poisoned")
threaded_put_ms("poisoned")
threaded_put_ms("poisoned", workers=8)

# does repeated dispatch pressure "unpoison" it?
f = jax.jit(lambda a: a + 1)
x = jnp.zeros((8, 128))
for _ in range(2000):
    x = f(x)
jax.block_until_ready(x)
put_ms("after 2000 tiny dispatches")

"""Probe: does an UNROLLED (loop-primitive-free) NMS-shaped program keep the
tunnel healthy?

docs/TUNNEL_PERF_NOTES.md: any real ``lax.while_loop`` / ``fori_loop`` body
permanently degrades the tunneled backend (~30x slower transfers).  Straight-
line big executables measured clean.  This probe dispatches the exact shape
of the planned unrolled keyframe step -- a Jacobi fixed-point ladder plus a
chain of ``lax.cond``-gated record bodies (argmin pick, row gathers,
dynamic_update_slice scatters on captured arrays) -- then measures
device_put latency and tiny-dispatch latency, the two poison symptoms.

Run in a FRESH process: python tools/probe_unrolled.py [G] [RECS]
Healthy: put ~0.7-1 ms for the 768 KB pair, tiny add ~0.03-0.5 ms.
Poisoned: put ~27-45 ms, tiny add ~2-3 ms.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from boxfusion_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

G = int(sys.argv[1]) if len(sys.argv) > 1 else 256
RECS = int(sys.argv[2]) if len(sys.argv) > 2 else 128
V = 5

img = np.random.randint(0, 255, (384, 512, 3), np.uint8)
dep = np.random.rand(384, 512).astype(np.float32)


def put_ms():
    for _ in range(3):
        r = jax.device_put((img, dep))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(15):
        r = jax.device_put((img, dep))
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / 15 * 1000


@jax.jit
def tiny(x):
    return x + 1.0


def tiny_ms():
    x = jnp.float32(0.0)
    jax.block_until_ready(tiny(x))
    t0 = time.perf_counter()
    for _ in range(30):
        x = tiny(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / 30 * 1000


_NEG = jnp.float32(-1e30)


@jax.jit
def unrolled_nms(scores, iou, n, flist, fcount):
    alive = jnp.arange(G) < n
    rank_key = jnp.argsort(jnp.argsort(-scores - jnp.arange(G) * 1e-7))

    # phase 1: Jacobi fixed point for greedy survivors (no loop primitive)
    earlier = rank_key[:, None] < rank_key[None, :]
    M = (iou > 0.1) & earlier & alive[:, None] & alive[None, :]
    Mf = M.astype(jnp.float32)
    surv = alive

    for _ in range(min(G, 64)):
        hit = jnp.matmul(Mf.T, surv.astype(jnp.float32),
                         precision=jax.lax.Precision.HIGHEST)
        surv = alive & (hit < 0.5)

    suppressed = alive & ~surv
    sup_of = jnp.argmax(
        jnp.where(M & surv[:, None], G - rank_key[:, None], 0), axis=0
    )
    prio = jnp.where(suppressed, rank_key[sup_of] * G + rank_key, 2 * G * G)

    # phase 2: cond-gated record chain (the unrolled sequential bookkeeping)
    def record(args):
        flist, fcount, prio = args
        j = jnp.argmin(prio)
        i = sup_of[j]
        prio = prio.at[j].set(2 * G * G)
        row = jnp.sort(
            jax.lax.dynamic_update_slice(
                flist[i], flist[j][:1], (jnp.minimum(fcount[i], V - 1),)
            )
        )
        flist = jax.lax.dynamic_update_slice(flist, row[None], (i, 0))
        fcount = fcount.at[i].add(1)
        return flist, fcount, prio

    c = (flist, fcount, prio)
    for _ in range(RECS):
        c = jax.lax.cond(jnp.min(c[2]) < 2 * G * G, record, lambda a: a, c)
    flist, fcount, _ = c
    return surv, flist, fcount


scores = jnp.asarray(np.random.rand(G).astype(np.float32))
iou = jnp.asarray((np.random.rand(G, G) * 0.14).astype(np.float32))  # ~30% pairs hit
flist = jnp.zeros((G, V), jnp.int32)
fcount = jnp.ones(G, jnp.int32)

print(f"pre-dispatch: put {put_ms():.2f} ms  tiny {tiny_ms():.3f} ms", flush=True)

t0 = time.perf_counter()
out = unrolled_nms(scores, iou, jnp.int32(G - 10), flist, fcount)
jax.block_until_ready(out)
print(f"compile+run: {time.perf_counter() - t0:.1f} s", flush=True)

t0 = time.perf_counter()
for _ in range(10):
    out = unrolled_nms(scores, iou, jnp.int32(G - 10), flist, fcount)
jax.block_until_ready(out)
print(f"steady-state run: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms", flush=True)

# sparse load: only a handful of contested boxes -> conds mostly skip
iou_sparse = jnp.asarray((np.random.rand(G, G) * 0.14).astype(np.float32) * (np.random.rand(G, G) < 0.002))
t0 = time.perf_counter()
for _ in range(10):
    out = unrolled_nms(scores, iou_sparse, jnp.int32(G - 10), flist, fcount)
jax.block_until_ready(out)
print(f"sparse-load run: {(time.perf_counter() - t0) / 10 * 1e3:.2f} ms", flush=True)

print(f"post-dispatch: put {put_ms():.2f} ms  tiny {tiny_ms():.3f} ms", flush=True)

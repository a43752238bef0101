"""Poison trigger: executable size? many-output programs? cond nesting?"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

sys.stdout = open("/tmp/probe8_out.txt", "w", buffering=1)

img = np.random.randint(0, 255, (384, 512, 3), np.uint8)
dep = np.random.rand(384, 512).astype(np.float32)
N = 15


def put_ms(tag):
    for _ in range(3):
        r = jax.device_put((img, dep))  # warm
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(N):
        r = jax.device_put((img, dep))
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / N * 1000
    print(f"  -> device_put after {tag}: {ms:7.2f} ms", flush=True)
    return ms


put_ms("nothing")

# 1) big executable: ~6000 distinct fused ops, fast runtime
def bigfn(x):
    for i in range(2000):
        x = x * (1.0 + 1e-6 * (i % 7)) + 1e-7 * (i % 5)
        if i % 100 == 0:
            x = jnp.tanh(x) * 0.5 + x * 0.5
    return x

big = jax.jit(bigfn)
t0 = time.perf_counter()
jax.block_until_ready(big(jnp.ones((128, 128))))
print(f"big compile+run {time.perf_counter()-t0:.1f} s", flush=True)
jax.block_until_ready(big(jnp.ones((128, 128))))
put_ms("big executable (2000+ ops)")

# 2) many outputs (30 arrays)
@jax.jit
def manyout(x):
    return {f"k{i}": x + i for i in range(30)}

jax.block_until_ready(manyout(jnp.ones((256, 256)))["k0"])
put_ms("30-output program")

# 3) nested cond inside while inside cond
@jax.jit
def nested(x):
    def inner(c):
        i, x = c
        x = jax.lax.cond(i % 2 == 0, lambda a: a * 1.001, lambda a: a * 0.999, x)
        return i + 1, x
    def outer(x):
        return jax.lax.while_loop(lambda c: c[0] < 200, inner, (0, x))[1]
    return jax.lax.cond(x.sum() > 0, outer, lambda a: a, x)

jax.block_until_ready(nested(jnp.ones((8, 128))))
put_ms("cond(while(cond)) nesting")

# 4) scatter-heavy while_loop (dynamic_update_slice on 2D state, like _record_one)
@jax.jit
def scatwl(mat):
    def body(c):
        i, m = c
        row = jnp.sort(m[i % 64] + 1.0)
        m = jax.lax.dynamic_update_slice(m, row[None], (i % 64, 0))
        return i + 1, m
    return jax.lax.while_loop(lambda c: c[0] < 500, body, (0, mat))[1]

jax.block_until_ready(scatwl(jnp.ones((64, 10))))
put_ms("scatter while_loop")

# 5) the pallas fitness at production size C=160
from boxfusion_tpu.ops.fitness_kernel import fitness_cells_pallas

C = 160
jax.block_until_ready(fitness_cells_pallas(
    jnp.ones((C, 8, 8, 128)), jnp.ones((C, 8, 8, 128)), jnp.ones((C, 8, 2)),
    jnp.ones((C, 12, 3)), jnp.ones((C, 12)), jnp.ones((C, 1)), jnp.ones((C, 1))))
put_ms("pallas fitness C=160")

# 6) the new fused lattice IoU at production size (1024 pairs)
from boxfusion_tpu.geometry.iou import obb_grid_iou_pairs
ca = jnp.tile(jnp.asarray(np.random.rand(8, 3), jnp.float32)[None], (1024, 1, 1))
cb = ca + 0.1
jax.block_until_ready(jax.jit(obb_grid_iou_pairs)(ca, cb))
put_ms("lattice IoU 1024 pairs")

"""Which construct poisons the axon-tunnel dispatch path?  Measure a tiny
jitted op's latency after running each candidate trigger."""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.stdout = open("/tmp/probe3_out.txt", "w", buffering=1)

N = 30


def tiny_ms():
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    jax.block_until_ready(tiny(x))
    t0 = time.perf_counter()
    for _ in range(N):
        x2 = tiny(x)
    jax.block_until_ready(x2)
    return (time.perf_counter() - t0) / N * 1000


print(f"baseline tiny: {tiny_ms():.3f} ms", flush=True)

# 1) small while_loop
@jax.jit
def wl(x):
    return jax.lax.while_loop(lambda c: c[0] < 10, lambda c: (c[0] + 1, c[1] * 1.01), (0, x))[1]

jax.block_until_ready(wl(jnp.ones((8, 128))))
print(f"after small while_loop: {tiny_ms():.3f} ms", flush=True)

# 2) nested while_loop with argmax body (NMS-shaped)
@jax.jit
def wl2(scores):
    def body(c):
        i, s = c
        j = jnp.argmax(s)
        return i + 1, s.at[j].set(-1.0)
    return jax.lax.while_loop(lambda c: c[0] < 100, body, (0, scores))[1]

jax.block_until_ready(wl2(jnp.ones(512)))
print(f"after NMS-shaped while_loop: {tiny_ms():.3f} ms", flush=True)

# 3) donation
@partial(jax.jit, donate_argnums=(0,))
def don(x):
    return x + 1.0

y = jnp.zeros((512, 512))
for _ in range(3):
    y = don(y)
jax.block_until_ready(y)
print(f"after donation: {tiny_ms():.3f} ms", flush=True)

# 4) big scatter / dynamic-update-slice chains
@jax.jit
def scat(x):
    for i in range(20):
        x = x.at[i].set(jnp.ones(512) * i)
    return x

jax.block_until_ready(scat(jnp.zeros((512, 512))))
print(f"after scatter chain: {tiny_ms():.3f} ms", flush=True)

# 5) a big fused elementwise reduce (the grid IoU shape)
@jax.jit
def lattice(corners):
    t = jnp.linspace(0, 1, 25)
    f = t[None, :, None, None] * t[None, None, :, None] * t[None, None, None, :]
    return jnp.sum(corners[:, None, None, None] * f, axis=(1, 2, 3))

jax.block_until_ready(lattice(jnp.ones(1024)))
print(f"after lattice fusion: {tiny_ms():.3f} ms", flush=True)

# 6) pallas fitness kernel
from boxfusion_tpu.ops.fitness_kernel import fitness_cells_pallas

C = 8
u = jnp.ones((C, 8, 8, 128))
v = jnp.ones((C, 8, 8, 128))
hull = jnp.ones((C, 8, 2))
planes = jnp.ones((C, 12, 3))
pvalid = jnp.ones((C, 12))
area = jnp.ones((C, 1))
wmask = jnp.ones((C, 1))
jax.block_until_ready(fitness_cells_pallas(u, v, hull, planes, pvalid, area, wmask))
print(f"after pallas fitness: {tiny_ms():.3f} ms", flush=True)

time.sleep(10)
print(f"after 10 s idle: {tiny_ms():.3f} ms", flush=True)

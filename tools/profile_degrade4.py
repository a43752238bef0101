"""Poison bisect round 2: long-device-time programs, many-leaf donation,
many outputs."""
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.stdout = open("/tmp/probe4_out.txt", "w", buffering=1)

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

# 1) long-running program: ~200 chained 1024^2 matmuls (~10+ ms device)
@jax.jit
def longprog(a):
    def body(i, x):
        return x @ a
    return jax.lax.fori_loop(0, 200, body, a)

a = jnp.eye(1024) * 0.999
t0 = time.perf_counter()
jax.block_until_ready(longprog(a))
jax.block_until_ready(longprog(a))
print(f"longprog wall: {(time.perf_counter()-t0)*1000:.1f} ms", flush=True)
print(f"after long-running program: {tiny_ms():.3f} ms", flush=True)

# 2) donated 24-leaf pytree
leaves = {f"k{i}": jnp.zeros((256, 256)) for i in range(24)}

@partial(jax.jit, donate_argnums=(0,))
def donmany(d):
    return {k: v + 1.0 for k, v in d.items()}

for _ in range(3):
    leaves = donmany(leaves)
jax.block_until_ready(leaves["k0"])
print(f"after 24-leaf donation x3: {tiny_ms():.3f} ms", flush=True)

# keep donating in a chain like the pipeline's state
for _ in range(10):
    leaves = donmany(leaves)
jax.block_until_ready(leaves["k0"])
print(f"after 24-leaf donation x13: {tiny_ms():.3f} ms", flush=True)

# 3) long-running program WITH donated carry
@partial(jax.jit, donate_argnums=(0,))
def longdon(x):
    def body(i, c):
        return c @ a2
    return jax.lax.fori_loop(0, 200, body, x)

a2 = jnp.eye(1024) * 0.999
x = jnp.ones((1024, 1024))
for _ in range(2):
    x = longdon(x)
jax.block_until_ready(x)
print(f"after long-running donated: {tiny_ms():.3f} ms", flush=True)

time.sleep(5)
print(f"after 5 s idle: {tiny_ms():.3f} ms", flush=True)

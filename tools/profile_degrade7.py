"""Map the poison trigger: program duration x loop kind x step size."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

sys.stdout = open("/tmp/probe7_out.txt", "w", buffering=1)

img = np.random.randint(0, 255, (384, 512, 3), np.uint8)
dep = np.random.rand(384, 512).astype(np.float32)
N = 15


def put_ms(tag):
    t0 = time.perf_counter()
    for _ in range(N):
        r = jax.device_put((img, dep))
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / N * 1000
    print(f"  -> device_put after {tag}: {ms:7.2f} ms", flush=True)
    return ms


put_ms("nothing")

# 1) while_loop with data-dependent trip count, ~5 ms device time
@jax.jit
def wl_5ms(s):
    def body(c):
        i, s = c
        j = jnp.argmax(s)
        return i + 1, (s.at[j].add(-1.0)) * 0.9999
    return jax.lax.while_loop(lambda c: c[0] < 3000, body, (0, s))[1]

t0 = time.perf_counter()
jax.block_until_ready(wl_5ms(jnp.ones(512)))
print(f"wl_5ms wall {((time.perf_counter()-t0))*1000:.1f} ms", flush=True)
put_ms("while_loop ~ms-scale")

# 2) fori_loop same body, static trip count
@jax.jit
def fl_5ms(s):
    def body(i, s):
        j = jnp.argmax(s)
        return (s.at[j].add(-1.0)) * 0.9999
    return jax.lax.fori_loop(0, 3000, body, s)

t0 = time.perf_counter()
jax.block_until_ready(fl_5ms(jnp.ones(512)))
print(f"fl_5ms wall {((time.perf_counter()-t0))*1000:.1f} ms", flush=True)
put_ms("fori_loop ~ms-scale")

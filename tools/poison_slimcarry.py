"""Slim-carry replica: iou/scores closed over; carry = small mutated arrays."""
import time
import jax, jax.numpy as jnp, numpy as np
from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

G = 512
_NEG = jnp.float32(-1e30)
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
def loop(scores, iou, n):
    slot_valid = jnp.arange(G) < n

    def cond(c):
        return jnp.any(c[0])

    def body(c):
        (remaining, keep, success, valid_num) = c
        s = jnp.where(remaining, scores, _NEG)
        m = jnp.max(s)
        i = jnp.argmax(jnp.where(s == m, jnp.arange(G) + 1, 0))
        keep = keep.at[i].set(True)
        remaining = remaining.at[i].set(False)
        ious = iou[i] * remaining          # gather from CLOSURE, not carry
        supp = remaining & (ious > 0.1)
        remaining = remaining & ~supp
        any_supp = jnp.any(supp)
        valid_num = valid_num.at[i].add(jnp.where(any_supp, 1.0, 0.0))
        success = success.at[i].set(success[i] | any_supp)
        return (remaining, keep, success, valid_num)

    c = (slot_valid, jnp.zeros(G, bool), jnp.zeros(G, bool), jnp.zeros(G))
    c = jax.lax.while_loop(cond, body, c)
    return c[1], c[2], c[3]

scores = jnp.asarray(np.random.rand(G).astype(np.float32))
iou = jnp.asarray((np.random.rand(G, G) * 0.3).astype(np.float32))
out = loop(scores, iou, jnp.int32(400))
jax.block_until_ready(out[0])
print(f"slim-carry replica: {put_ms():.2f} ms", flush=True)

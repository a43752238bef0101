"""All-f32-mask replica of the outer NMS loop (no bool arrays anywhere)."""
import sys, time
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
    slot_valid = (jnp.arange(G) < n).astype(jnp.float32)

    def cond(c):
        return jnp.max(c[1]) > 0.5

    def body(c):
        (scores, remaining, keep, success, valid_num, iou) = c
        s = jnp.where(remaining > 0.5, scores, _NEG)
        m = jnp.max(s)
        slot = jnp.arange(G)
        i = jnp.argmax(jnp.where(s == m, slot + 1, 0))
        keep = keep.at[i].set(1.0)
        remaining = remaining.at[i].set(0.0)
        ious = iou[i] * remaining
        supp = remaining * (ious > 0.1).astype(jnp.float32)
        remaining = remaining * (1.0 - supp)
        any_supp = jnp.max(supp)
        valid_num = valid_num.at[i].add(any_supp)
        success = success.at[i].max(any_supp)
        return (scores, remaining, keep, success, valid_num, iou)

    c = (scores, slot_valid, jnp.zeros(G), jnp.zeros(G), jnp.zeros(G), iou)
    c = jax.lax.while_loop(cond, body, c)
    return c[2], c[3], c[4]

scores = jnp.asarray(np.random.rand(G).astype(np.float32))
iou = jnp.asarray((np.random.rand(G, G) * 0.3).astype(np.float32))
out = loop(scores, iou, jnp.int32(400))
jax.block_until_ready(out[0])
print(f"f32-mask replica: {put_ms():.2f} ms", flush=True)

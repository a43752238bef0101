"""One poison-trigger variant per process: python poison_variant.py <variant>.

Prints '<variant>: <ms>' -- the device_put latency after running the variant.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

variant = sys.argv[1]
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


def argmax_desc(scores, mask):
    s = jnp.where(mask, scores, _NEG)
    m = jnp.max(s)
    slot = jnp.arange(s.shape[0])
    return jnp.argmax(jnp.where(s == m, slot + 1, 0))


iou_const = jnp.asarray((np.random.rand(G, G) * 0.3).astype(np.float32))


@jax.jit
def loop(scores, iou, n):
    slot_valid = jnp.arange(G) < n

    if variant == "counter_cond":
        def cond(c):
            return c[6] < 400
    elif variant == "traced_bound":
        def cond(c):
            return c[6] < n
    else:
        def cond(c):
            return jnp.any(c[1])

    def body(c):
        (scores, remaining, keep, success, valid_num, iou, _t) = c
        if variant == "plain_argmax":
            i = jnp.argmax(jnp.where(remaining, scores, _NEG))
        else:
            i = argmax_desc(scores, remaining)
        keep = keep.at[i].set(True)
        remaining = remaining.at[i].set(False)
        if variant == "no_rowgather":
            ious = jnp.roll(scores, 1) * remaining
        elif variant == "captured_iou":
            ious = iou_const[i] * remaining
        else:
            ious = iou[i] * remaining
        supp = remaining & (ious > 0.1)
        remaining = remaining & ~supp
        any_supp = jnp.any(supp)
        if variant == "no_scatter":
            one = jax.nn.one_hot(i, G)
            valid_num = valid_num + one * jnp.where(any_supp, 1.0, 0.0)
            success = success | (one > 0) & any_supp
        else:
            valid_num = valid_num.at[i].add(jnp.where(any_supp, 1.0, 0.0))
            success = success.at[i].set(success[i] | any_supp)
        return (scores, remaining, keep, success, valid_num, iou, c[6] + 1)

    c = (scores, slot_valid, jnp.zeros(G, bool), jnp.zeros(G, bool), jnp.zeros(G), iou, jnp.int32(0))
    c = jax.lax.while_loop(cond, body, c)
    return c[2], c[3], c[4]


scores = jnp.asarray(np.random.rand(G).astype(np.float32))
iou = jnp.asarray((np.random.rand(G, G) * 0.3).astype(np.float32))
out = loop(scores, iou, jnp.int32(400))
jax.block_until_ready(out[0])
print(f"{variant}: {put_ms():.2f} ms", flush=True)


# appended: no-bool-carry variant runs instead when argv is "f32_masks"

"""Final discriminators: (a) clean loop + row gather only; (b) size sweep."""
import sys, time
import jax, jax.numpy as jnp, numpy as np
from boxfusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

which = sys.argv[1]
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

if which == "gather_only":
    G = 512
    iou = jnp.asarray((np.random.rand(G, G) * 0.3).astype(np.float32))

    @jax.jit
    def wl(s):
        def body(c):
            i, s = c
            j = jnp.argmax(s)
            row = iou[j]                       # the ONLY addition vs clean probe
            s = (s.at[j].add(-1.0)) * 0.9999 + 1e-9 * row
            return i + 1, s
        return jax.lax.while_loop(lambda c: c[0] < 3000, body, (0, s))[1]

    jax.block_until_ready(wl(jnp.ones(G)))
    print(f"gather_only: {put_ms():.2f} ms", flush=True)

elif which.startswith("size"):
    G = int(which[4:])
    _NEG = jnp.float32(-1e30)

    @jax.jit
    def loop(scores, iou, n):
        def cond(c):
            return jnp.any(c[0])
        def body(c):
            (remaining, keep, valid_num) = c
            s = jnp.where(remaining, scores, _NEG)
            i = jnp.argmax(jnp.where(s == jnp.max(s), jnp.arange(G) + 1, 0))
            keep = keep.at[i].set(True)
            remaining = remaining.at[i].set(False)
            supp = remaining & (iou[i] * remaining > 0.1)
            remaining = remaining & ~supp
            valid_num = valid_num.at[i].add(jnp.where(jnp.any(supp), 1.0, 0.0))
            return (remaining, keep, valid_num)
        c = (jnp.arange(G) < n, jnp.zeros(G, bool), jnp.zeros(G))
        return jax.lax.while_loop(cond, body, c)[1]

    scores = jnp.asarray(np.random.rand(G).astype(np.float32))
    iou = jnp.asarray((np.random.rand(G, G) * 0.3).astype(np.float32))
    jax.block_until_ready(loop(scores, iou, jnp.int32(min(400, G))))
    print(f"{which}: {put_ms():.2f} ms", flush=True)

elif which == "flat_slice":
    G = 512
    iou = jnp.asarray((np.random.rand(G, G) * 0.3).astype(np.float32))
    flat = iou.reshape(-1)

    @jax.jit
    def wl(s):
        def body(c):
            i, s = c
            j = jnp.argmax(s)
            row = jax.lax.dynamic_slice(flat, (j * G,), (G,))
            s = (s.at[j].add(-1.0)) * 0.9999 + 1e-9 * row
            return i + 1, s
        return jax.lax.while_loop(lambda c: c[0] < 3000, body, (0, s))[1]

    jax.block_until_ready(wl(jnp.ones(G)))
    print(f"flat_slice: {put_ms():.2f} ms", flush=True)

elif which == "onehot_row":
    G = 512
    iou = jnp.asarray((np.random.rand(G, G) * 0.3).astype(np.float32))

    @jax.jit
    def wl(s):
        def body(c):
            i, s = c
            j = jnp.argmax(s)
            row = jax.nn.one_hot(j, G, dtype=jnp.float32) @ iou
            s = (s.at[j].add(-1.0)) * 0.9999 + 1e-9 * row
            return i + 1, s
        return jax.lax.while_loop(lambda c: c[0] < 3000, body, (0, s))[1]

    jax.block_until_ready(wl(jnp.ones(G)))
    print(f"onehot_row: {put_ms():.2f} ms", flush=True)

elif which == "g1d":
    vec = jnp.asarray(np.random.rand(4096).astype(np.float32))

    @jax.jit
    def wl(s):
        def body(c):
            i, s = c
            j = jnp.argmax(s)
            val = vec[j * 7 % 4096]
            s = (s.at[j].add(-1.0)) * 0.9999 + 1e-9 * val
            return i + 1, s
        return jax.lax.while_loop(lambda c: c[0] < 3000, body, (0, s))[1]

    jax.block_until_ready(wl(jnp.ones(512)))
    print(f"g1d: {put_ms():.2f} ms", flush=True)

elif which == "g2d_small":
    mat = jnp.asarray(np.random.rand(512, 10).astype(np.float32))

    @jax.jit
    def wl(s):
        def body(c):
            i, s = c
            j = jnp.argmax(s)
            row = mat[j]
            s = (s.at[j].add(-1.0)) * 0.9999 + 1e-9 * row.sum()
            return i + 1, s
        return jax.lax.while_loop(lambda c: c[0] < 3000, body, (0, s))[1]

    jax.block_until_ready(wl(jnp.ones(512)))
    print(f"g2d_small: {put_ms():.2f} ms", flush=True)

elif which == "g3d_pose":
    mat = jnp.asarray(np.random.rand(4096, 4, 4).astype(np.float32))

    @jax.jit
    def wl(s):
        def body(c):
            i, s = c
            j = jnp.argmax(s)
            pose = mat[j * 3 % 4096]
            s = (s.at[j].add(-1.0)) * 0.9999 + 1e-9 * pose.sum()
            return i + 1, s
        return jax.lax.while_loop(lambda c: c[0] < 3000, body, (0, s))[1]

    jax.block_until_ready(wl(jnp.ones(512)))
    print(f"g3d_pose: {put_ms():.2f} ms", flush=True)

elif which == "masked_sum":
    vec = jnp.asarray(np.random.rand(4096).astype(np.float32))
    idxs = jnp.arange(4096)

    @jax.jit
    def wl(s):
        def body(c):
            i, s = c
            j = jnp.argmax(s)
            val = jnp.sum(jnp.where(idxs == j * 7 % 4096, vec, 0.0))
            s = (s.at[j].add(-1.0)) * 0.9999 + 1e-9 * val
            return i + 1, s
        return jax.lax.while_loop(lambda c: c[0] < 3000, body, (0, s))[1]

    jax.block_until_ready(wl(jnp.ones(512)))
    print(f"masked_sum: {put_ms():.2f} ms", flush=True)

elif which == "heal_test":
    iou = jnp.asarray((np.random.rand(512, 512) * 0.3).astype(np.float32))

    @jax.jit
    def wl(s):
        def body(c):
            i, s = c
            j = jnp.argmax(s)
            row = iou[j]
            s = (s.at[j].add(-1.0)) * 0.9999 + 1e-9 * row
            return i + 1, s
        return jax.lax.while_loop(lambda c: c[0] < 3000, body, (0, s))[1]

    jax.block_until_ready(wl(jnp.ones(512)))
    print(f"heal: poisoned = {put_ms():.2f} ms", flush=True)
    del wl
    jax.clear_caches()
    print(f"heal: after clear_caches = {put_ms():.2f} ms", flush=True)
    import gc; gc.collect()
    import time as _t; _t.sleep(5)
    print(f"heal: after gc+5s = {put_ms():.2f} ms", flush=True)

elif which == "second_array":
    vec2 = jnp.asarray(np.random.rand(512).astype(np.float32))

    @jax.jit
    def wl(s):
        def body(c):
            i, s = c
            j = jnp.argmax(s)
            s = (s.at[j].add(-1.0)) * 0.9999 + 1e-9 * vec2
            return i + 1, s
        return jax.lax.while_loop(lambda c: c[0] < 3000, body, (0, s))[1]

    jax.block_until_ready(wl(jnp.ones(512)))
    print(f"second_array: {put_ms():.2f} ms", flush=True)
    # put-size ladder in the (possibly) poisoned state
    for nm, arr in [("37f", np.zeros(37, np.float32)),
                    ("100KB", np.zeros((100, 256), np.float32)),
                    ("1MB", np.zeros((512, 512), np.float32)),
                    ("2MB", (np.zeros((384, 512, 3), np.uint8), np.zeros((384, 512), np.float32)))]:
        for _ in range(3):
            r = jax.device_put(arr)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(15):
            r = jax.device_put(arr)
        jax.block_until_ready(r)
        print(f"  put {nm}: {(time.perf_counter()-t0)/15*1000:7.2f} ms", flush=True)

elif which == "fori_nms":
    # the poisoning NMS replica body, but as a STATIC-trip fori_loop
    G = 512
    _NEG2 = jnp.float32(-1e30)
    iou = jnp.asarray((np.random.rand(G, G) * 0.3).astype(np.float32))
    scores0 = jnp.asarray(np.random.rand(G).astype(np.float32))

    @jax.jit
    def loop(scores, n):
        def body(t, c):
            (remaining, keep, success, valid_num) = c
            s = jnp.where(remaining, scores, _NEG2)
            m = jnp.max(s)
            i = jnp.argmax(jnp.where(s == m, jnp.arange(G) + 1, 0))
            alive = remaining[i]
            keep = keep.at[i].set(keep[i] | alive)
            remaining = remaining.at[i].set(False)
            ious = iou[i] * remaining
            supp = remaining & (ious > 0.1) & alive
            remaining = remaining & ~supp
            any_supp = jnp.any(supp)
            valid_num = valid_num.at[i].add(jnp.where(any_supp, 1.0, 0.0))
            success = success.at[i].set(success[i] | any_supp)
            return (remaining, keep, success, valid_num)

        c = (jnp.arange(G) < n, jnp.zeros(G, bool), jnp.zeros(G, bool), jnp.zeros(G))
        return jax.lax.fori_loop(0, G, body, c)

    out = loop(scores0, jnp.int32(400))
    jax.block_until_ready(out[0])
    print(f"fori_nms: {put_ms():.2f} ms", flush=True)

"""Verify the flat-transfer redesign of the fused block loop.

Hypothesis: host<->device transfers of arrays with tiny trailing dims
((B,H,W,1) images, (B,R,3) packed runs) hit tile-padding blowup through
the tunnel; flat 1D buffers move at ~1 GB/s. Reshape on device.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

print("platform:", jax.devices()[0].platform, flush=True)

B, H, W = 16, 512, 512
RUNS = 16385


# --- shaped vs flat H2D, fresh arrays each rep -------------------------
def h2d(x, reps=4):
    jax.device_put(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_put(x).block_until_ready()
    return (time.perf_counter() - t0) / reps


img = np.random.rand(B, H, W, 1).astype(np.float32)
print(f"H2D (B,H,W,1) f32: {h2d(img) * 1000:.1f} ms", flush=True)
print(f"H2D (B,H,W)   f32: {h2d(img[..., 0]) * 1000:.1f} ms", flush=True)
print(f"H2D flat      f32: {h2d(img.ravel()) * 1000:.1f} ms", flush=True)
u8 = (img * 255).astype(np.uint8)
print(f"H2D flat      u8 : {h2d(u8.ravel()) * 1000:.1f} ms", flush=True)


# --- D2H fresh arrays (uncached), shaped vs flat ------------------------
from functools import partial


@partial(jax.jit, static_argnums=(1,))
def make_packed(seed, flat):
    x = jnp.full((B, RUNS, 3), seed, jnp.int32)
    return x.reshape(-1) if flat else x


def d2h(flat, reps=4):
    outs = [make_packed(i, flat) for i in range(reps)]
    jax.block_until_ready(outs)
    t0 = time.perf_counter()
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / reps


print(f"D2H (B,R,3) i32 fresh: {d2h(False) * 1000:.1f} ms", flush=True)
print(f"D2H flat    i32 fresh: {d2h(True) * 1000:.1f} ms", flush=True)


# --- full block loop, flat in / flat out --------------------------------
@jax.jit
def block_fn_flat(carry, flat_u8, mean, std):
    x = flat_u8.reshape(B, H, W).astype(jnp.float32) / 255.0
    x = (x - mean) / std
    s = jnp.sum(x, axis=(1, 2)) + carry
    packed = jnp.broadcast_to(
        s[:, None, None], (B, RUNS, 3)).astype(jnp.int32)
    return s, packed.reshape(-1)


x_flat = u8.ravel()
carry = jnp.zeros((B,), jnp.float32)
carry, p = block_fn_flat(carry, x_flat, 0.5, 0.3)
np.asarray(p)

N = 8


def run(depth):
    c = jnp.zeros((B,), jnp.float32)
    q = deque()
    t0 = time.perf_counter()
    for _ in range(N):
        c, p = block_fn_flat(c, x_flat, 0.5, 0.3)
        try:
            p.copy_to_host_async()
        except Exception:
            pass
        q.append(p)
        if len(q) > depth:
            np.asarray(q.popleft())
    while q:
        np.asarray(q.popleft())
    dt = time.perf_counter() - t0
    print(f"flat block loop depth {depth}: {dt / N * 1000:.1f} ms/block "
          f"= {N * B / dt:.1f} slices/s", flush=True)


run(0)
run(1)
run(2)
run(4)

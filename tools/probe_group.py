"""Pallas fori-loop grouping vs XLA broadcast+argmin, on TPU.

Bit-exactness requirement: same difference-form distance (dy*dy+dx*dx
+ penalty, f32) and first-min tie-break (argmin), so results must be
IDENTICAL, not just close.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from empanada_tpu.ops.pallas_group import group_pixels_pallas

print("platform:", jax.devices()[0].platform, flush=True)

H = W = 128
K = 256
B = 8
STEP = 4.0
N_ITER = 50

rng = np.random.default_rng(0)
centers = rng.integers(0, H, (B, K, 2)).astype(np.int32)
valid = rng.random((B, K)) < 0.4
offsets = (rng.standard_normal((B, H, W, 2)) * 8).astype(np.float32)

_BIG = 1e10


@jax.jit
def group_bcast(centers, valid, offsets):
    def one(centers, valid, offsets):
        h, w, _ = offsets.shape
        k = centers.shape[0]
        ctr = centers.astype(jnp.float32) * STEP
        penalty = jnp.where(valid, 0.0, _BIG).astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        loc_y = rows.astype(jnp.float32) * STEP + offsets[..., 0]
        loc_x = cols.astype(jnp.float32) * STEP + offsets[..., 1]
        dy = loc_y[..., None] - ctr[None, None, :, 0]
        dx = loc_x[..., None] - ctr[None, None, :, 1]
        d = dy * dy + dx * dx + penalty[None, None, :]
        return (jnp.argmin(d, axis=-1) + 1).astype(jnp.int32)

    return jax.vmap(one)(centers, valid, offsets)


@jax.jit
def group_pallas_b(centers, valid, offsets):
    return jax.vmap(
        lambda c, v, o: group_pixels_pallas(c, v, o, step=STEP))(
        centers, valid, offsets)


c, v, o = (jax.device_put(jnp.asarray(a), jax.devices()[0])
           for a in (centers, valid, offsets))

ra = np.asarray(group_pallas_b(c, v, o))
rb = np.asarray(group_bcast(c, v, o))
print("identical:", (ra == rb).all(),
      "mismatch:", int((ra != rb).sum()), "/", ra.size)

sanity = jax.jit(lambda a: (a @ a).sum())
x = jax.device_put(jnp.ones((8192, 8192), jnp.bfloat16))
np.asarray(sanity(x))

for name, fn in (("pallas", group_pallas_b), ("bcast", group_bcast)):
    r = fn(c, v, o)
    np.asarray(r)
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        r = fn(c, v, o)
    s = np.asarray(jnp.sum(r))
    dt = (time.perf_counter() - t0) / N_ITER * 1e3
    t0 = time.perf_counter()
    np.asarray(sanity(x))
    ts = (time.perf_counter() - t0) * 1e3
    print(f"{name}: {dt:.3f} ms/call  (sanity matmul {ts:.1f} ms)  sum={s}")

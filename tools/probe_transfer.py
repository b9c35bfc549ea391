"""H2D/D2H tunnel characterization: size scaling, dtype, overlap.

Run on the axon TPU: python tools/probe_transfer.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print("platform:", dev.platform, flush=True)


def t_h2d(nbytes, reps=4):
    x = np.random.randint(0, 255, (nbytes,), dtype=np.uint8)
    jax.device_put(x).block_until_ready()  # warm path
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.device_put(x).block_until_ready()
    return (time.perf_counter() - t0) / reps


for mb in (0.25, 1, 4, 16):
    dt = t_h2d(int(mb * 1e6))
    print(f"H2D {mb:5.2f}MB: {dt * 1000:7.1f} ms  "
          f"({mb / dt:6.1f} MB/s)", flush=True)


def t_d2h(nbytes, reps=4):
    x = jnp.zeros((nbytes,), jnp.uint8) + 1
    jax.block_until_ready(x)
    np.asarray(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(x)
    return (time.perf_counter() - t0) / reps


for mb in (0.25, 1, 4, 16):
    dt = t_d2h(int(mb * 1e6))
    print(f"D2H {mb:5.2f}MB: {dt * 1000:7.1f} ms  "
          f"({mb / dt:6.1f} MB/s)", flush=True)

# do H2D and D2H overlap when issued from two threads?
up = np.random.randint(0, 255, (4_000_000,), dtype=np.uint8)
down = jnp.zeros((4_000_000,), jnp.uint8) + 1
jax.block_until_ready(down)
np.asarray(down)
jax.device_put(up).block_until_ready()

REPS = 4


def up_loop():
    for _ in range(REPS):
        jax.device_put(up).block_until_ready()


def down_loop():
    for _ in range(REPS):
        np.asarray(down)


t0 = time.perf_counter()
up_loop()
down_loop()
serial = time.perf_counter() - t0

t0 = time.perf_counter()
th1 = threading.Thread(target=up_loop)
th2 = threading.Thread(target=down_loop)
th1.start(); th2.start(); th1.join(); th2.join()
overlap = time.perf_counter() - t0
print(f"4MB x{REPS} each way: serial {serial:.2f}s, "
      f"threaded {overlap:.2f}s (overlap gain "
      f"{serial / overlap:.2f}x)", flush=True)

# do two concurrent H2D streams share bandwidth or add up?
t0 = time.perf_counter()
th1 = threading.Thread(target=up_loop)
th2 = threading.Thread(target=up_loop)
th1.start(); th2.start(); th1.join(); th2.join()
both = time.perf_counter() - t0
print(f"2x concurrent H2D 4MB x{REPS}: {both:.2f}s vs serial "
      f"{serial - overlap + serial:.2f}ish", flush=True)

# uint8 upload + on-device normalize-to-f32 vs f32 upload (block shaped)
B, H, W = 16, 512, 512
img_u8 = np.random.randint(0, 255, (B, H, W, 1), dtype=np.uint8)
img_f32 = img_u8.astype(np.float32)


@jax.jit
def norm(x):
    return (x.astype(jnp.float32) / 255.0 - 0.5) / 0.3


norm(jax.device_put(img_u8)).block_until_ready()

t0 = time.perf_counter()
for _ in range(4):
    norm(jax.device_put(img_u8)).block_until_ready()
u8 = (time.perf_counter() - t0) / 4
t0 = time.perf_counter()
for _ in range(4):
    jax.device_put(img_f32).block_until_ready()
f32 = (time.perf_counter() - t0) / 4
print(f"block upload: uint8+device-norm {u8 * 1000:.1f} ms vs "
      f"f32 {f32 * 1000:.1f} ms", flush=True)

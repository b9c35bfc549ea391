"""Measure tunnel dispatch/transfer overlap on the real TPU.

Questions this answers (all with tiny, fast-compiling graphs):
  1. serial dispatch+consume per call (the round-trip floor)
  2. dispatch K chained calls, then consume all (does dispatch pipeline?)
  3. copy_to_host_async overlap: issue all copies, then wait
  4. does a D2H in flight block the next dispatch?
  5. H2D cost in the loop (device_put per block)

Run: python tools/probe_pipeline.py   (on the axon TPU, NOT forced cpu)
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import time

import jax
import jax.numpy as jnp
import numpy as np

print("platform:", jax.devices()[0].platform, flush=True)

# block-like payloads: ~16 MB in, ~3 MB out, trivial compute, carried state
H = W = 512
B = 16
RUNS = 16385


@jax.jit
def block_fn(carry, x):
    s = jnp.sum(x, axis=(1, 2, 3)) + carry
    packed = jnp.broadcast_to(
        s[:, None, None], (B, RUNS, 3)).astype(jnp.int32)
    return s, packed


x_host = np.random.rand(B, H, W, 1).astype(np.float32)
carry = jnp.zeros((B,), jnp.float32)
carry, packed = block_fn(carry, x_host)  # compile
np.asarray(packed)

N = 8


def timeit(name, fn):
    t0 = time.perf_counter()
    fn()
    dt = time.perf_counter() - t0
    print(f"{name}: {dt:.3f}s total, {dt / N * 1000:.1f} ms/block",
          flush=True)


# 1. serial: dispatch, consume, dispatch, consume ...
def serial():
    c = jnp.zeros((B,), jnp.float32)
    for _ in range(N):
        c, p = block_fn(c, x_host)
        np.asarray(p)


timeit("serial dispatch+consume", serial)


# 2. dispatch all, then consume all
def dispatch_all():
    c = jnp.zeros((B,), jnp.float32)
    outs = []
    for _ in range(N):
        c, p = block_fn(c, x_host)
        outs.append(p)
    for p in outs:
        np.asarray(p)


timeit("dispatch-all then consume-all", dispatch_all)


# 3. dispatch all + copy_to_host_async immediately
def dispatch_async_copy():
    c = jnp.zeros((B,), jnp.float32)
    outs = []
    for _ in range(N):
        c, p = block_fn(c, x_host)
        try:
            p.copy_to_host_async()
        except Exception as e:
            print("  copy_to_host_async unsupported:", e, flush=True)
        outs.append(p)
    for p in outs:
        np.asarray(p)


timeit("dispatch-all + async host copy", dispatch_async_copy)


# 4. bounded pipeline depth 2 (realistic: consume k while k+1 in flight)
def pipelined(depth):
    def run():
        from collections import deque

        c = jnp.zeros((B,), jnp.float32)
        q = deque()
        for _ in range(N):
            c, p = block_fn(c, x_host)
            try:
                p.copy_to_host_async()
            except Exception:
                pass
            q.append(p)
            if len(q) > depth:
                np.asarray(q.popleft())
        while q:
            np.asarray(q.popleft())

    return run


timeit("pipeline depth 1", pipelined(1))
timeit("pipeline depth 2", pipelined(2))
timeit("pipeline depth 4", pipelined(4))


# 5. consumer-thread model (matcher thread pulls while producer dispatches)
def threaded():
    import queue
    import threading

    qq = queue.Queue()

    def worker():
        while True:
            p = qq.get()
            if p is None:
                return
            np.asarray(p)

    t = threading.Thread(target=worker)
    t.start()
    c = jnp.zeros((B,), jnp.float32)
    for _ in range(N):
        c, p = block_fn(c, x_host)
        qq.put(p)
    qq.put(None)
    t.join()


timeit("producer + consumer thread", threaded)

# 6. pure H2D cost
t0 = time.perf_counter()
for _ in range(N):
    jax.device_put(x_host).block_until_ready()
print(f"H2D 16MB x{N}: {(time.perf_counter() - t0) / N * 1000:.1f} "
      f"ms/transfer", flush=True)

# 7. pure D2H cost of the packed buffer
outs = []
c = jnp.zeros((B,), jnp.float32)
for _ in range(N):
    c, p = block_fn(c, x_host)
    outs.append(p)
jax.block_until_ready(outs)
t0 = time.perf_counter()
for p in outs:
    np.asarray(p)
print(f"D2H 3MB x{N} (ready): {(time.perf_counter() - t0) / N * 1000:.1f} "
      f"ms/transfer", flush=True)

# 8. D2H of the big pan buffer (16 MB) for comparison
big = jnp.zeros((B, H, W), jnp.int32) + 1
jax.block_until_ready(big)
t0 = time.perf_counter()
np.asarray(big)
print(f"D2H 16MB pan: {(time.perf_counter() - t0) * 1000:.1f} ms",
      flush=True)

"""Pallas TPU kernel: offset-vote pixel grouping (nearest-center argmin).

The hottest non-conv postprocess op (reference postprocess.py:78-168):
every pixel p is assigned the id of the center minimizing
||p + offset(p) - c_k||^2 over K centers. The XLA version
(ops/postprocess.group_pixels) materializes chunk×HW distance slabs
through a lax.scan; this kernel streams row tiles through VMEM once,
keeping the (K, 2) center table resident and carrying only the running
(best_d, best_id) pair per pixel — one HBM pass over the offsets, no
intermediate distance matrix.

Grid: (H // TILE_H,). Block: offsets tile (TILE_H, W, 2) in VMEM;
centers+validity as a fused (K, 4) f32 table [cy, cx, big_penalty, id].
The K loop is a fori_loop over the VMEM table (K is a static cap,
reference engines cap centers at max_centers).

Falls back to the jnp implementation off-TPU (pallas interpret mode is
used by the CPU test suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["group_pixels_pallas"]

_BIG = 1e10


def _kernel(table_ref, offy_ref, offx_ref, out_ref, *, tile_h, width,
            step, k):
    i = pl.program_id(0)
    row0 = (i * tile_h) * step

    # int32 iota then cast: Mosaic TPU doesn't lower float iota
    rows = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, width), 0).astype(jnp.float32) * step
    cols = jax.lax.broadcasted_iota(
        jnp.int32, (tile_h, width), 1).astype(jnp.float32) * step
    loc_y = rows + row0 + offy_ref[:]
    loc_x = cols + offx_ref[:]

    def body(j, carry):
        best_d, best_id = carry
        cy = table_ref[j, 0]
        cx = table_ref[j, 1]
        penalty = table_ref[j, 2]     # 0 for valid, _BIG for padding
        dy = loc_y - cy
        dx = loc_x - cx
        d = dy * dy + dx * dx + penalty
        take = d < best_d
        best_d = jnp.where(take, d, best_d)
        best_id = jnp.where(take, jnp.float32(j + 1), best_id)
        return best_d, best_id

    init = (jnp.full((tile_h, width), _BIG, jnp.float32),
            jnp.zeros((tile_h, width), jnp.float32))
    _, best_id = jax.lax.fori_loop(0, k, body, init)
    out_ref[:] = best_id.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("step", "tile_h", "interpret"))
def group_pixels_pallas(centers, valid, offsets, step=1.0, tile_h=8,
                        interpret=False):
    """Drop-in for ops.postprocess.group_pixels.

    Args:
        centers: (K, 2) int32 (y, x) in offsets-grid units.
        valid: (K,) bool.
        offsets: (H, W, 2) float32 full-resolution-unit offsets.
    Returns:
        (H, W) int32 1-based nearest-center ids.
    """
    h, w, _ = offsets.shape
    k = centers.shape[0]

    ctr = centers.astype(jnp.float32) * step
    penalty = jnp.where(valid, 0.0, _BIG).astype(jnp.float32)
    table = jnp.concatenate(
        [ctr, penalty[:, None], jnp.zeros((k, 1), jnp.float32)], axis=1)

    # pad rows to a tile multiple
    ph = (-h) % tile_h
    offs = jnp.pad(offsets.astype(jnp.float32), ((0, ph), (0, 0), (0, 0)))
    hp = h + ph
    offy = offs[..., 0]
    offx = offs[..., 1]

    grid = (hp // tile_h,)
    out = pl.pallas_call(
        functools.partial(_kernel, tile_h=tile_h, width=w,
                          step=float(step), k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, w), jnp.int32),
        interpret=interpret,
    )(table, offy, offx)
    return out[:h]

"""On-device run-boundary extraction.

The dense->sparse frontier of the pipeline: instead of shipping the whole
(H, W) panoptic map to host (reference does full D2H + numpy regionprops,
rle.py:26-86), the device computes row-split constant-value runs under jit
with a static capacity, so only ~O(#runs) int32 crosses the PCIe/ICI
boundary. Host code (inference/rle.py) finishes CCL + per-instance
grouping on the compact runs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["extract_runs", "extract_fg_runs", "runs_capacity"]


def runs_capacity(h: int, w: int, max_runs: int | None = None) -> int:
    """Default static run capacity: 4 runs/row average covers EM-style
    blob content with a wide margin; callers can override."""
    if max_runs is not None:
        return max_runs
    return max(1024, 8 * h)


def extract_runs(pan: jax.Array, max_runs: int):
    """Row-split runs of a (H, W) int32 image.

    Returns:
        starts: (max_runs,) int32 raveled start indices (padded with -1)
        ends: (max_runs,) int32 raveled end indices (exclusive)
        values: (max_runs,) int32 run values
        n_runs: () int32 true run count. If n_runs > max_runs the output is
            truncated — callers fall back to host encoding.
    """
    h, w = pan.shape
    flat = pan.reshape(-1)
    n = h * w

    prev = jnp.concatenate([jnp.full((1,), -1, flat.dtype), flat[:-1]])
    col0 = (jnp.arange(n, dtype=jnp.int32) % w) == 0
    is_start = (flat != prev) | col0

    n_runs = jnp.sum(is_start.astype(jnp.int32))

    # compact the boundary indices into a fixed-size buffer via sort
    # (jnp.nonzero's size-static lowering scatters -> serial on TPU)
    idx32 = jnp.arange(n, dtype=jnp.int32)
    starts = jax.lax.sort(jnp.where(is_start, idx32, n))[:max_runs]
    # end of run i = start of run i+1 (or n for the last)
    ends = jnp.concatenate([starts[1:], jnp.full((1,), n, jnp.int32)])
    ends = jnp.minimum(ends, n)
    valid = starts < n
    values = flat[jnp.minimum(starts, n - 1)].astype(jnp.int32)

    starts = jnp.where(valid, starts, -1)
    ends = jnp.where(valid, ends, -1)
    values = jnp.where(valid, values, 0)
    return starts, ends, values, n_runs


def extract_fg_runs(pan: jax.Array, max_runs: int):
    """Row-split runs of NONZERO values only.

    The D2H payload shrinks by the background fraction (typically 5-20x
    for EM content); background extents are implicit. Callers transfer
    only the first n_runs entries of each buffer.

    Runs never cross rows, so compaction works ROW-WISE (per-row bitonic
    depth log^2 W, ~4x shallower than one global H*W sort): a log-depth
    suffix-min gives every cell the NEXT start col after it (= run end),
    then ONE per-row sort_key_val compacts (fg start col, end col) pairs
    to the row front, and an O(max_runs) comparison-reduce assembly maps
    global slots to (row, rank).

    Returns (starts, ends, values, n_runs) like extract_runs, but only
    foreground runs are present (padded with -1/0).
    """
    h, w = pan.shape
    flat = pan.reshape(-1)
    n = h * w

    cols = jnp.arange(w, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((h, 1), bool), pan[:, 1:] != pan[:, :-1]], axis=1)
    is_fg_start = is_start & (pan != 0)

    # end of the run starting at col c = the next start col after c (or
    # w): a log-depth suffix-min, computed densely so ONE per-row sort
    # (fg start cols, with the end riding along) replaces the previous
    # two-sort + sorted-table-gather assembly (~3.7 ms per 8x512^2
    # block in the device trace)
    start_pos = jnp.where(is_start, cols[None, :], w)
    sufmin = jax.lax.associative_scan(jnp.minimum, start_pos,
                                      reverse=True, axis=1)
    nxt = jnp.concatenate(
        [sufmin[:, 1:], jnp.full((h, 1), w, jnp.int32)], axis=1)

    key = jnp.where(is_fg_start, cols[None, :], w)
    P, NXT = jax.lax.sort_key_val(key, nxt, dimension=1)

    row_counts = jnp.sum(is_fg_start, axis=1, dtype=jnp.int32)
    offsets = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(row_counts)])
    total = offsets[-1]

    # global slot j -> (row, within-row rank); all gathers are O(max_runs).
    # row of slot j = #offsets <= j, computed as a dense comparison
    # reduce over the (max_runs, h+1) grid: jnp.searchsorted lowers to a
    # vmapped while-loop of serialized gathers on TPU (measured ~5 ms
    # per 8x512^2 block in the device trace); the 2M-element compare+sum
    # is ~free and exact
    j = jnp.arange(max_runs, dtype=jnp.int32)
    r = jnp.sum(j[:, None] >= offsets[None, 1:], axis=1,
                dtype=jnp.int32)
    valid = j < total
    r = jnp.clip(r, 0, h - 1)
    within = jnp.clip(j - offsets[r], 0, w - 1)
    start_col = P[r, within]
    end_col = NXT[r, within]

    starts = r * w + start_col
    ends = r * w + end_col
    values = flat[jnp.minimum(starts, n - 1)].astype(jnp.int32)

    starts = jnp.where(valid, starts, -1)
    ends = jnp.where(valid, ends, -1)
    values = jnp.where(valid, values, 0)
    return starts, ends, values, total

"""Direct property tests for the device-side ops rewritten for TPU:

- extract_fg_runs (ops/rle_device.py): suffix-min + one-sort row-wise
  compaction vs a straightforward numpy scan, over adversarial content
  (dense alternation, empty, solid, overflow truncation).
- point_sample (ops/sampling.py): single 2x2-patch gather vs the naive
  4-corner zero-padded reference (torch grid_sample align_corners=False
  semantics, reference point_rend.py:35-60), including border coords
  where zero padding and clamping differ.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from empanada_tpu.ops.rle_device import extract_fg_runs, extract_runs
from empanada_tpu.ops.sampling import point_sample


def np_fg_runs(pan):
    """Row-split nonzero runs in raveled-start order."""
    h, w = pan.shape
    out = []
    for r in range(h):
        c = 0
        while c < w:
            v = pan[r, c]
            e = c
            while e < w and pan[r, e] == v:
                e += 1
            if v != 0:
                out.append((r * w + c, r * w + e, int(v)))
            c = e
    return out


def check_fg(pan, max_runs):
    starts, ends, values, n = (np.asarray(a) for a in
                               extract_fg_runs(jnp.asarray(pan), max_runs))
    ref = np_fg_runs(pan)
    assert int(n) == len(ref)
    k = min(len(ref), max_runs)
    ref_s, ref_e, ref_v = (np.array([t[i] for t in ref[:k]], np.int64)
                           for i in range(3))
    np.testing.assert_array_equal(starts[:k], ref_s)
    np.testing.assert_array_equal(ends[:k], ref_e)
    np.testing.assert_array_equal(values[:k], ref_v)
    if k < max_runs:
        assert (starts[k:] == -1).all() and (values[k:] == 0).all()


@pytest.mark.parametrize("shape", [(8, 16), (17, 33), (1, 64), (64, 1)])
def test_fg_runs_random(shape):
    rng = np.random.default_rng(0)
    for density in (0.0, 0.3, 0.9, 1.0):
        pan = np.where(rng.random(shape) < density,
                       rng.integers(1, 5, shape), 0).astype(np.int32)
        check_fg(pan, max_runs=8 * shape[0] + 32)


def test_fg_runs_dense_alternation_overflows_cleanly():
    h, w = 8, 32
    pan = (np.indices((h, w)).sum(0) % 3).astype(np.int32)  # runs of len 1
    check_fg(pan, max_runs=8 * h)          # fits
    check_fg(pan, max_runs=17)             # truncates to first 17 runs


def test_fg_runs_solid_and_empty():
    check_fg(np.zeros((6, 20), np.int32), 48)
    check_fg(np.full((6, 20), 7, np.int32), 48)
    pan = np.zeros((4, 9), np.int32)
    pan[2] = 3                              # full-row run
    pan[3, 8] = 1                           # run touching the row end
    check_fg(pan, 32)


def test_fg_runs_agrees_with_extract_runs():
    rng = np.random.default_rng(1)
    pan = np.where(rng.random((16, 24)) < 0.5,
                   rng.integers(1, 4, (16, 24)), 0).astype(np.int32)
    s_all, e_all, v_all, _ = (np.asarray(a) for a in
                              extract_runs(jnp.asarray(pan), 16 * 24))
    keep = v_all != 0
    s_fg, e_fg, v_fg, n = (np.asarray(a) for a in
                           extract_fg_runs(jnp.asarray(pan), 16 * 24))
    np.testing.assert_array_equal(s_fg[:n], s_all[: len(s_all)][keep][:n])
    np.testing.assert_array_equal(e_fg[:n], e_all[keep][:n])
    np.testing.assert_array_equal(v_fg[:n], v_all[keep][:n])


def test_group_pixels_pallas_matches_xla_slab():
    """The opt-in Pallas VMEM grouping kernel (EMPANADA_PALLAS_GROUP=1)
    must stay bit-identical to the default fused-slab XLA path
    (interpret mode off-TPU). On-chip the two were measured identical
    over random content (tools/probe_group2 2026-08-17)."""
    from empanada_tpu.ops.pallas_group import group_pixels_pallas
    from empanada_tpu.ops.postprocess import group_pixels

    rng = np.random.default_rng(5)
    k, h, w = 64, 32, 48
    centers = jnp.asarray(rng.integers(0, h, (k, 2)), jnp.int32)
    valid = jnp.asarray(rng.random(k) < 0.5)
    offsets = jnp.asarray(rng.standard_normal((h, w, 2)) * 6, jnp.float32)
    for step in (1.0, 4.0):
        want = np.asarray(group_pixels(centers, valid, offsets, step=step,
                                       use_pallas=False))
        got = np.asarray(group_pixels_pallas(centers, valid, offsets,
                                             step=step, interpret=True))
        np.testing.assert_array_equal(got, want)


def np_point_sample(features, coords):
    """Naive 4-corner bilinear with zero padding (the prior formulation)."""
    n, h, w, c = features.shape
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = np.floor(x).astype(np.int64)
    y0 = np.floor(y).astype(np.int64)
    wx = (x - np.floor(x))[..., None]
    wy = (y - np.floor(y))[..., None]

    def corner(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yc, xc = np.clip(yy, 0, h - 1), np.clip(xx, 0, w - 1)
        vals = np.stack([features[i][yc[i], xc[i]] for i in range(n)])
        return vals * valid[..., None]

    top = corner(y0, x0) * (1 - wx) + corner(y0, x0 + 1) * wx
    bot = corner(y0 + 1, x0) * (1 - wx) + corner(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def test_point_sample_matches_naive_reference():
    rng = np.random.default_rng(2)
    n, h, w, c = 3, 7, 11, 5
    feats = rng.standard_normal((n, h, w, c)).astype(np.float32)
    coords = rng.random((n, 257, 2)).astype(np.float32)
    # force border coords where zero-padding vs clamping differ, and
    # exact pixel centers (integer lerp weights)
    coords[:, :8, :] = [[0.0, 0.0], [1.0, 1.0], [0.0, 1.0], [1.0, 0.0],
                        [0.01, 0.5], [0.5, 0.99], [1.5 / w, 2.5 / h],
                        [0.5 / w, 0.5 / h]]
    got = np.asarray(point_sample(jnp.asarray(feats), jnp.asarray(coords)))
    want = np_point_sample(feats, coords)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_point_sample_nearest_mode():
    rng = np.random.default_rng(3)
    feats = rng.standard_normal((2, 5, 6, 3)).astype(np.float32)
    coords = rng.random((2, 64, 2)).astype(np.float32)
    got = np.asarray(point_sample(jnp.asarray(feats), jnp.asarray(coords),
                                  mode="nearest"))
    x = np.clip(np.round(coords[..., 0] * 6 - 0.5).astype(int), 0, 5)
    y = np.clip(np.round(coords[..., 1] * 5 - 0.5).astype(int), 0, 4)
    want = np.stack([feats[i][y[i], x[i]] for i in range(2)])
    np.testing.assert_array_equal(got, want)

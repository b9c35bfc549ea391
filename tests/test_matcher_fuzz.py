"""Property test: rle_matcher's Hungarian assignment must agree with a
brute-force dense-mask computation on random geometry."""

import numpy as np
from scipy.optimize import linear_sum_assignment

from empanada_tpu.inference.matcher import rle_matcher
from empanada_tpu.inference.rle import pan_seg_to_rle_seg


def _random_seg(rng, h=120, w=120, n=8, label_base=1000):
    seg = np.zeros((h, w), np.int64)
    for i in range(1, n + 1):
        cy, cx = rng.integers(10, h - 10), rng.integers(10, w - 10)
        r = int(rng.integers(4, 14))
        yy, xx = np.mgrid[:h, :w]
        seg[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = label_base + i
    return seg


def _dense_iou_matrix(a, b, la, lb):
    m = np.zeros((len(la), len(lb)))
    for i, x in enumerate(la):
        ma = a == x
        for j, y in enumerate(lb):
            mb = b == y
            inter = np.logical_and(ma, mb).sum()
            union = np.logical_or(ma, mb).sum()
            m[i, j] = inter / union if union else 0.0
    return m


def test_matcher_agrees_with_dense_bruteforce(rng):
    for trial in range(5):
        a = _random_seg(rng, n=int(rng.integers(3, 9)))
        b = _random_seg(rng, n=int(rng.integers(3, 9)))
        ra = pan_seg_to_rle_seg(a, [1], 1000, [1], force_connected=False)[1]
        rb = pan_seg_to_rle_seg(b, [1], 1000, [1], force_connected=False)[1]
        # force_connected=False keeps original labels; overlapping disks
        # merge labels so recompute the live label sets from the dicts
        la = sorted(ra)
        lb = sorted(rb)

        matched, all_labels, ious = rle_matcher(ra, rb, iou_thr=0.5)

        dense = _dense_iou_matrix(a, b, la, lb)
        rows, cols = linear_sum_assignment(dense, maximize=True)
        keep = dense[rows, cols] >= 0.5
        want_pairs = {(la[i], lb[j])
                      for i, j in zip(rows[keep], cols[keep])}
        got_pairs = set(zip(matched[0].tolist(), matched[1].tolist()))
        assert got_pairs == want_pairs, (trial, got_pairs, want_pairs)
        # matched IoUs agree with dense computation
        for (x, y), iou in zip(zip(*matched), ious):
            i, j = la.index(x), lb.index(y)
            assert abs(dense[i, j] - iou) < 1e-9

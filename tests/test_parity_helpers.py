"""Unit tests for the e2e parity test's scoring helpers.

tools/parity_e2e.py's instance_parity / score_at / margin_threshold are
what tests/test_parity_e2e.py asserts with — pin their semantics on
hand-checkable labelmaps so a helper regression can't silently weaken
the flagship parity test.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.parity_e2e import (  # noqa: E402
    instance_parity,
    margin_threshold,
    score_at,
)


def _map(*rects, shape=(20, 20)):
    """Build a labelmap from (label, y0, y1, x0, x1) rectangles."""
    out = np.zeros(shape, np.int32)
    for lab, y0, y1, x0, x1 in rects:
        out[y0:y1, x0:x1] = lab
    return out


class TestInstanceParity:
    def test_identical_maps_match_at_iou_1(self):
        a = _map((1, 2, 8, 2, 8), (2, 10, 16, 10, 16))
        ious, n_a, n_b = instance_parity(a, a.copy())
        assert n_a == n_b == 2
        assert ious == [1.0, 1.0]

    def test_partial_overlap_iou_exact(self):
        # 6x6 square vs the same square shifted 3 right: inter 18,
        # union 54 -> IoU 1/3
        a = _map((1, 0, 6, 0, 6))
        b = _map((7, 0, 6, 3, 9))
        ious, n_a, n_b = instance_parity(a, b)
        assert n_a == n_b == 1
        np.testing.assert_allclose(ious, [18 / 54])

    def test_greedy_matching_is_one_to_one(self):
        # one big instance in `a` overlapping two in `b`: only ONE
        # match is allowed; the second b instance goes unmatched
        a = _map((1, 0, 10, 0, 20))
        b = _map((5, 0, 10, 0, 12), (6, 0, 10, 12, 20))
        ious, n_a, n_b = instance_parity(a, b)
        assert (n_a, n_b) == (1, 2)
        assert len(ious) == 1
        # greedy takes the larger-IoU pair: 120/200 over 80/200
        np.testing.assert_allclose(ious, [120 / 200])

    def test_background_never_matches(self):
        a = _map((1, 0, 4, 0, 4))
        b = np.zeros_like(a)
        ious, n_a, n_b = instance_parity(a, b)
        assert (n_a, n_b) == (1, 0)
        assert ious == []

    def test_label_values_are_irrelevant(self):
        a = _map((1, 2, 8, 2, 8), (2, 10, 16, 10, 16))
        b = _map((1004, 2, 8, 2, 8), (99, 10, 16, 10, 16))
        ious, n_a, n_b = instance_parity(a, b)
        assert n_a == n_b == 2 and ious == [1.0, 1.0]


class TestScoreAt:
    def test_perfect_prediction(self):
        gt = _map((1, 2, 8, 2, 8), (2, 10, 16, 10, 16))
        pq, f1 = score_at(gt.copy(), gt, 0.5)
        assert pq == 1.0 and f1 == 1.0

    def test_threshold_flips_a_borderline_match(self):
        # IoU 1/3 instance: matched at thr 0.25, unmatched at thr 0.5
        gt = _map((1, 0, 6, 0, 6))
        pred = _map((1, 0, 6, 3, 9))
        pq_lo, f1_lo = score_at(pred, gt, 0.25)
        pq_hi, f1_hi = score_at(pred, gt, 0.5)
        np.testing.assert_allclose((pq_lo, f1_lo), (18 / 54, 1.0))
        # unmatched: TP=0, FP=1, FN=1
        assert (pq_hi, f1_hi) == (0.0, 0.0)

    def test_false_positive_and_negative_penalties(self):
        # 2 GT, 1 matched perfectly, 1 missed, plus 1 spurious pred:
        # PQ = 1.0 / (1 + 1/2 + 1/2) = 0.5; F1 = 1 / (1 + 1) = 0.5
        gt = _map((1, 0, 6, 0, 6), (2, 10, 16, 10, 16))
        pred = _map((1, 0, 6, 0, 6), (9, 0, 4, 14, 18))
        pq, f1 = score_at(pred, gt, 0.5)
        assert (pq, f1) == (0.5, 0.5)


class TestMarginThreshold:
    def test_picks_farthest_candidate_from_knife_edge(self):
        # both pipelines put their single instance at IoU ~0.5 vs GT:
        # the chosen threshold must not be 0.5
        gt = _map((1, 0, 6, 0, 6))
        a = _map((1, 0, 6, 2, 8))  # IoU 24/48 = 0.5 exactly
        b = _map((1, 0, 6, 2, 8))
        thr = margin_threshold(a, b, gt)
        assert abs(thr - 0.5) >= 0.1
        # and at that threshold both pipelines score identically
        assert score_at(a, gt, thr) == score_at(b, gt, thr)

    def test_margin_is_over_both_pipelines(self):
        # a at IoU ~0.44, b at IoU ~0.56: 0.5 is mid-gap BETWEEN them
        # but close to both; the best candidate maximizes the min
        # distance over the union of IoUs
        gt = _map((1, 0, 10, 0, 10))
        a = _map((1, 0, 10, 2, 12))   # inter 80, union 120 -> 0.667
        b = _map((1, 0, 10, 4, 14))   # inter 60, union 140 -> 0.429
        thr = margin_threshold(a, b, gt)
        dists = [abs(80 / 120 - thr), abs(60 / 140 - thr)]
        # no candidate does better than the chosen one
        for cand in (0.35, 0.4, 0.45, 0.5, 0.55, 0.6, 0.65):
            assert min(dists) >= min(abs(80 / 120 - cand),
                                     abs(60 / 140 - cand)) - 1e-12

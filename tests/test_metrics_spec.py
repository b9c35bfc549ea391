"""Port of the reference's metric edge-case spec
(reference tests/test_metrics.py:40-119): constructed logits/panoptic maps
with exact expected IoU/PQ/F1 values, including the just-under-0.5-IoU
detection edge case."""

import jax.numpy as jnp
import numpy as np
from numpy.testing import assert_almost_equal

from empanada_tpu.metrics import IoU, PQ, F1, AverageMeter


def sem_binary():
    """Half-overlapping binary prediction -> IoU 0.5 (reference :40-53)."""
    gt = np.zeros((1, 128, 128), np.float32)
    gt[:, :64] = 1
    logits = np.full((1, 128, 128, 1), -10.0, np.float32)
    logits[:, :32] = 10.0  # predict half of gt: iou = 32/64 = 0.5
    return {"sem_logits": jnp.asarray(logits)}, {"sem": jnp.asarray(gt)}


def panoptic_case():
    """The reference's PQ/F1 spec (test_metrics.py:75-119)."""
    gt = np.zeros((128, 128), np.int64)
    gt[:32, :32] = 1001
    gt[:32, -32:] = 2001
    gt[-32:, -32:] = 2002

    pred = np.zeros((128, 128), np.int64)
    pred[:32, :32] = 1001
    pred[:15, -32:] = 2002  # just under 0.5 iou vs gt 2001
    pred[-32:, -32:] = 2001

    return {"pan_seg": gt}, {"pan_seg": pred}


def test_iou_binary_half():
    pred, gt = sem_binary()
    iou = IoU(AverageMeter, [1]).calculate(pred, gt)
    assert_almost_equal(float(iou[1]), 0.5, decimal=3)


def test_pq_and_f1_edge():
    gt, pred = panoptic_case()
    pq = PQ(AverageMeter, [1, 2], 1000).calculate(pred, gt)
    # class 1: exact match -> 1.0; class 2: one exact match (swapped ids
    # are fine for matching), one just-under-0.5 -> counts as FP+FN:
    # sq = 1.0, rq = 1/(1+0.5+0.5) = 0.5 -> pq = 0.5
    assert_almost_equal(float(pq[1]), 1.0, decimal=3)
    assert_almost_equal(float(pq[2]), 0.5, decimal=3)

    # at iou_thr 0.4 the 15/32 overlap (iou ~0.469) becomes a TP
    f1 = F1(AverageMeter, [2], 1000, iou_thr=0.4).calculate(pred, gt)
    assert_almost_equal(float(f1[2]), 1.0, decimal=3)
    # at 0.5 the match fails: tp=1, fp=1, fn=1 -> f1 = 0.5
    f1_50 = F1(AverageMeter, [2], 1000, iou_thr=0.5).calculate(pred, gt)
    assert_almost_equal(float(f1_50[2]), 0.5, decimal=3)

"""Semantic metrics on (n, 2) [start, run] arrays
(reference evaluation/semantic_metrics.py:4-27)."""

from empanada_tpu.core.rle import rle_iou

__all__ = ["iou"]


def iou(gt_rle, pred_rle):
    if len(gt_rle) == 0 and len(pred_rle) == 0:
        return 1
    if len(gt_rle) == 0 or len(pred_rle) == 0:
        return 0
    return rle_iou(gt_rle[:, 0], gt_rle[:, 1], pred_rle[:, 0], pred_rle[:, 1])

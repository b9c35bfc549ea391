"""The reference's flagship integration invariant
(reference tests/test_data_post.py:13-69): dataset target creation
followed by panoptic postprocessing of those *targets* must reproduce the
original GT mask with PQ/F1 ~= 1. This pins the postprocess semantics to
the target-encoding semantics end to end."""

import os

import cv2
import numpy as np
import pytest

from empanada_tpu.data import PanopticDataset, SingleClassInstanceDataset
from empanada_tpu.metrics import PQ, F1, AverageMeter
from empanada_tpu.ops.postprocess import get_panoptic_segmentation


def _write_pair(root, mask, idx=0):
    for d in ("images", "masks"):
        os.makedirs(os.path.join(root, "ds0", d), exist_ok=True)
    img = (np.random.rand(*mask.shape) * 255).astype(np.uint8)
    cv2.imwrite(os.path.join(root, "ds0", "images", f"{idx}.png"), img)
    cv2.imwrite(os.path.join(root, "ds0", "masks", f"{idx}.png"),
                mask.astype(np.uint16))


def _instance_mask(h=128, w=128):
    mask = np.zeros((h, w), np.int64)
    yy, xx = np.mgrid[:h, :w]
    blobs = [(30, 30, 14), (30, 90, 12), (85, 40, 16), (95, 100, 10)]
    for i, (cy, cx, r) in enumerate(blobs, start=1):
        mask[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = i
    return mask


class TestTargetRoundtrip:
    def test_single_class_instance(self, tmp_path):
        mask = _instance_mask()
        _write_pair(str(tmp_path), mask)
        ds = SingleClassInstanceDataset(str(tmp_path))
        ex = ds[0]

        pan = np.asarray(get_panoptic_segmentation(
            ex["sem"][..., None], ex["ctr_hmp"][..., 0], ex["offsets"],
            thing_list=[1], label_divisor=1000, stuff_area=64,
            void_label=0, threshold=0.1, nms_kernel=7, max_centers=64))

        gt_pan = np.where(mask > 0, 1000 + mask, 0)
        out = {"pan_seg": pan}
        tgt = {"pan_seg": gt_pan}
        pq = PQ(AverageMeter, [1], 1000).calculate(out, tgt)[1]
        f1 = F1(AverageMeter, [1], 1000).calculate(out, tgt)[1]
        assert pq == pytest.approx(1.0, abs=1e-3)
        assert f1 == pytest.approx(1.0, abs=1e-3)

    def test_panoptic_dataset(self, tmp_path):
        h = w = 128
        label_divisor = 100
        inst = _instance_mask(h, w)
        # class 1 = things (the blobs), class 2 = stuff stripe
        mask = np.where(inst > 0, 1 * label_divisor + inst, 0)
        mask[:20, :] = 2 * label_divisor
        _write_pair(str(tmp_path), mask)

        ds = PanopticDataset(str(tmp_path), labels=[1, 2], thing_list=[1],
                             label_divisor=label_divisor)
        ex = ds[0]
        # multiclass: one-hot probabilities from the integer sem target
        sem_prob = np.stack([(ex["sem"] == c).astype(np.float32)
                             for c in range(3)], axis=-1)
        pan = np.asarray(get_panoptic_segmentation(
            sem_prob, ex["ctr_hmp"][..., 0], ex["offsets"],
            thing_list=[1], label_divisor=label_divisor, stuff_area=64,
            void_label=0, threshold=0.1, nms_kernel=7, max_centers=64,
            num_classes=3))

        gt_pan = mask.copy()
        for label in (1, 2):
            out = {"pan_seg": pan}
            tgt = {"pan_seg": gt_pan}
            pq = PQ(AverageMeter, [label], label_divisor).calculate(
                out, tgt)[label]
            assert pq == pytest.approx(1.0, abs=1e-2), (label, pq)

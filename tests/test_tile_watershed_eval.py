"""Tiling round-trip (reference tests/test_tiling.py), watershed decoding,
and offline evaluation tests."""

import numpy as np
import pytest

from empanada_tpu.core.ccl3d import connected_components_3d, size_threshold_3d
from empanada_tpu.evaluation.evaluator import default_evaluator
from empanada_tpu.inference import patterns
from empanada_tpu.inference.consensus import merge_objects_from_tiles
from empanada_tpu.inference.matcher import rle_matcher
from empanada_tpu.inference.rle import pan_seg_to_rle_seg
from empanada_tpu.inference.tile import Tiler, fixed_size_tiles
from empanada_tpu.inference.tracker import InstanceTracker
from empanada_tpu.inference.watershed import bc_watershed, mask_watershed


def _disk_grid(h=300, w=300, r=12, step=50):
    """Grid of labeled disks (the reference test_tiling fixture style)."""
    seg = np.zeros((h, w), np.int64)
    yy, xx = np.mgrid[:h, :w]
    label = 1
    for cy in range(step // 2, h, step):
        for cx in range(step // 2, w, step):
            disk = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
            seg[disk] = 1000 + label
            label += 1
    return seg


class TestTiler:
    def test_fixed_size_tiles_cover_and_overlap(self):
        for length, tile, border in [(300, 128, 32), (1000, 256, 64),
                                     (100, 128, 32), (257, 128, 16)]:
            tiles = fixed_size_tiles(length, tile, border)
            assert tiles[0][0] == 0
            assert tiles[-1][1] == min(length, max(tiles[-1][1], length))
            assert tiles[-1][1] == length or tile >= length
            # same size everywhere
            sizes = {e - s for s, e in tiles}
            assert len(sizes) == 1
            # coverage + overlap
            for (s1, e1), (s2, e2) in zip(tiles, tiles[1:]):
                assert e1 - s2 >= border

    def test_tile_roundtrip_f1(self):
        """Tile -> local CCL relabel -> RLE -> translate -> merge == whole
        (the reference's F1==1.0 invariant, test_tiling.py:27-57)."""
        seg = _disk_grid()
        tiler = Tiler(seg.shape, tile_size=128, overlap_width=32)
        assert len(tiler) > 4

        tiles = []
        for t in range(len(tiler)):
            tile_seg = tiler(seg, t)
            rle_seg = pan_seg_to_rle_seg(
                tile_seg, [1], 1000, [1], force_connected=True)
            # per-class instance dicts, class 1
            tiles.append(tiler.translate_rle_seg(rle_seg, t)[1])

        merged = merge_objects_from_tiles(tiles, tiler.overlap_rle)

        # compare against the untiled RLE seg via Hungarian matching
        gt = pan_seg_to_rle_seg(seg, [1], 1000, [1])[1]
        matched_labels, all_labels, matched_ious = rle_matcher(gt, merged,
                                                               iou_thr=0.5)
        tp = len(matched_labels[0])
        fn = len(np.setdiff1d(all_labels[0], matched_labels[0]))
        fp = len(np.setdiff1d(all_labels[1], matched_labels[1]))
        f1 = tp / (tp + 0.5 * fn + 0.5 * fp)
        assert f1 == pytest.approx(1.0, abs=1e-3)
        assert np.all(matched_ious > 0.99)

    def test_overlap_mask(self):
        tiler = Tiler((300, 300), tile_size=128, overlap_width=32)
        mask = tiler.overlap_mask()
        assert mask.sum() > 0
        # overlap region is exactly where >= 2 tiles cover
        cover = np.zeros((300, 300), np.int32)
        for t in range(len(tiler)):
            ys, ye = tiler.yranges[t]
            xs, xe = tiler.xranges[t]
            cover[ys:ye, xs:xe] += 1
        np.testing.assert_array_equal(mask > 0, cover >= 2)


class TestCCL3d:
    def test_connectivity_semantics(self):
        v = np.zeros((4, 6, 6), np.uint8)
        v[1, 1, 1] = 1
        v[2, 2, 2] = 1  # 26-diagonal neighbor
        assert connected_components_3d(v, 26).max() == 1
        assert connected_components_3d(v, 6).max() == 2

    def test_multilabel_and_dust(self):
        v = np.zeros((3, 10, 10), np.uint8)
        v[:, 1:4, 1:4] = 1
        v[:, 1:4, 6:9] = 2  # different value: never merges
        v[0, 8, 8] = 1      # 1-voxel speck
        cc = connected_components_3d(v, 26)
        assert cc.max() == 3
        cleaned = size_threshold_3d(cc, 5)
        assert len(set(np.unique(cleaned)) - {0}) == 2


class TestWatershed:
    def test_splits_touching_objects(self):
        D = H = W = 24
        zz, yy, xx = np.mgrid[:D, :H, :W]
        b1 = (zz - 12) ** 2 + (yy - 7) ** 2 + (xx - 12) ** 2 <= 25
        b2 = (zz - 12) ** 2 + (yy - 16) ** 2 + (xx - 12) ** 2 <= 25
        sem = ((b1 | b2) * 255).astype(np.uint8)
        cnt = np.zeros_like(sem)
        cnt[:, 11:13, :] = np.where((b1 | b2)[:, 11:13, :], 255, 0)
        seg = bc_watershed(np.stack([sem, cnt]), thres1=0.5, thres2=0.5,
                           thres3=0.5, seed_thres=2, min_size=4,
                           label_divisor=1000)
        ids = set(np.unique(seg)) - {0}
        assert len(ids) == 2
        assert all(i > 1000 for i in ids)
        assert (seg > 0).sum() == (sem > 127).sum()

    def test_mask_watershed_matches_mask(self):
        mask = np.zeros((5, 10, 10), bool)
        mask[:, 2:8, 2:8] = True
        markers = np.zeros((5, 10, 10), np.int64)
        markers[2, 4, 4] = 7
        out = mask_watershed(mask, markers)
        assert set(np.unique(out)) == {0, 7}
        np.testing.assert_array_equal(out > 0, mask)


class TestEvaluator:
    def _tracker_json(self, tmp_path, name, instances, shape=(10, 20, 20)):
        tr = InstanceTracker(class_id=1, label_divisor=1000, shape3d=shape)
        tr.instances = instances
        tr.finished = True
        path = str(tmp_path / f"{name}.json")
        tr.write_to_json(path)
        return path

    def test_perfect_prediction(self, tmp_path):
        inst = {
            1001: {"box": (0, 0, 0, 5, 5, 5),
                   "starts": np.array([0, 100]), "runs": np.array([50, 20])},
            1002: {"box": (5, 5, 5, 9, 9, 9),
                   "starts": np.array([2000]), "runs": np.array([100])},
        }
        gt = self._tracker_json(tmp_path, "gt", inst)
        pred = self._tracker_json(tmp_path, "pred", inst)
        results = default_evaluator()(gt, pred)
        assert results["iou"] == pytest.approx(1.0)
        assert results["f1_50"] == 1.0 and results["f1_75"] == 1.0
        assert results["recall_50"] == 1.0 and results["precision_50"] == 1.0
        assert results["pq"] == pytest.approx(1.0, abs=1e-4)

    def test_partial_prediction(self, tmp_path):
        gt_inst = {
            1001: {"box": (0, 0, 0, 5, 5, 5),
                   "starts": np.array([0]), "runs": np.array([100])},
            1002: {"box": (5, 5, 5, 9, 9, 9),
                   "starts": np.array([2000]), "runs": np.array([100])},
        }
        pred_inst = {
            1001: {"box": (0, 0, 0, 5, 5, 5),
                   "starts": np.array([0]), "runs": np.array([100])},
            # false positive far away
            1003: {"box": (9, 9, 9, 10, 10, 10),
                   "starts": np.array([3900]), "runs": np.array([50])},
        }
        gt = self._tracker_json(tmp_path, "gt", gt_inst)
        pred = self._tracker_json(tmp_path, "pred", pred_inst)
        results, inst = default_evaluator()(gt, pred, return_instances=True)
        # tp=1, fp=1, fn=1 -> f1 = 0.5, precision = recall = 0.5
        assert results["f1_50"] == pytest.approx(0.5)
        assert results["precision_50"] == pytest.approx(0.5)
        assert results["recall_50"] == pytest.approx(0.5)
        assert len(inst["gt_unmatched"]) == 1
        assert len(inst["pred_unmatched"]) == 1

"""Host-side sparse pipeline invariants: RLE seg conversion, matching,
tracking (fill-reconstruction), JSON roundtrip, and consensus semantics.
Modeled on the reference's test strategy (synthetic geometry)."""

import numpy as np
import pytest

from empanada_tpu.core import numpy_fill_instances
from empanada_tpu.inference.consensus import (
    merge_objects_from_trackers,
    merge_semantic_from_trackers,
)
from empanada_tpu.inference.matcher import RLEMatcher, rle_matcher
from empanada_tpu.inference.rle import (
    pan_seg_to_rle_seg,
    rle_seg_to_pan_seg,
)
from empanada_tpu.inference.tracker import InstanceTracker
from empanada_tpu.inference import filters
from empanada_tpu.core.rle import rle_encode


def _rect_seg(shape, rects):
    """rects: list of (label, y1, x1, y2, x2)."""
    seg = np.zeros(shape, dtype=np.int64)
    for lab, y1, x1, y2, x2 in rects:
        seg[y1:y2, x1:x2] = lab
    return seg


def _ball_mask(shape, center, radius):
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    return ((zz - center[0]) ** 2 + (yy - center[1]) ** 2
            + (xx - center[2]) ** 2) <= radius ** 2


def _mask_to_tracker(mask, label, class_id=1, label_divisor=1000):
    """Build a finished tracker holding one 3D instance."""
    tr = InstanceTracker(class_id, label_divisor, mask.shape, "xy")
    idx = np.nonzero(mask.ravel())[0]
    starts, runs = rle_encode(idx)
    zs, ys, xs = np.nonzero(mask)
    box = (zs.min(), ys.min(), xs.min(), zs.max() + 1, ys.max() + 1,
           xs.max() + 1)
    tr.instances[label] = {"box": tuple(int(b) for b in box),
                           "starts": starts, "runs": runs}
    tr.finished = True
    return tr


class TestRLESeg:
    def test_roundtrip(self, rng):
        pan = np.zeros((50, 60), dtype=np.int64)
        pan[5:15, 5:15] = 1 * 1000 + 1    # thing instance
        pan[30:45, 30:50] = 1 * 1000 + 2  # another
        pan[0:4, 40:60] = 2 * 1000        # stuff class 2
        rle_seg = pan_seg_to_rle_seg(pan, [1, 2], 1000, [1],
                                     force_connected=True)
        rec = rle_seg_to_pan_seg(rle_seg, pan.shape)
        # instance ids may be renumbered by CCL, but partitions must match
        assert set(np.unique(rec)) == set(np.unique(pan))
        for lab in np.unique(pan):
            masks_equal = False
            for lab2 in np.unique(rec):
                if np.array_equal(rec == lab2, pan == lab):
                    masks_equal = True
            assert masks_equal

    def test_force_connected_splits(self):
        pan = np.zeros((20, 20), dtype=np.int64)
        pan[2:5, 2:5] = 1001
        pan[12:16, 12:16] = 1001  # same id, disconnected
        rle_seg = pan_seg_to_rle_seg(pan, [1], 1000, [1],
                                     force_connected=True)
        assert len(rle_seg[1]) == 2
        rle_seg2 = pan_seg_to_rle_seg(pan, [1], 1000, [1],
                                      force_connected=False)
        assert len(rle_seg2[1]) == 1


class TestMatcher:
    def test_relabeling_and_false_split(self):
        ld = 1000
        target = _rect_seg((200, 200), [(ld + 1, 10, 10, 60, 60),
                                        (ld + 2, 100, 100, 160, 160)])
        # match: one overlapping rect (relabel), one split into two
        # fragments both inside target instance 2 (heal), one new
        match = _rect_seg((200, 200), [(ld + 7, 12, 12, 58, 58),
                                       (ld + 8, 100, 100, 125, 160),
                                       (ld + 9, 135, 100, 160, 160),
                                       (ld + 10, 180, 0, 200, 20)])
        t_rle = pan_seg_to_rle_seg(target, [1], ld, [1])[1]
        m_rle = pan_seg_to_rle_seg(match, [1], ld, [1])[1]

        matcher = RLEMatcher(1, ld, merge_iou_thr=0.25, merge_ioa_thr=0.25)
        matcher.initialize_target(t_rle)
        out = matcher(m_rle)

        # fragment ids healed into target 2; relabeled rect takes target 1
        t_labels = sorted(t_rle.keys())
        assert t_labels[0] in out  # big rect matched
        assert t_labels[1] in out  # fragments merged to target id
        new_labels = [k for k in out if k not in t_labels]
        assert len(new_labels) == 1  # the unmatched new object
        # healed instance contains both fragments' area
        healed = out[t_labels[1]]
        assert int(healed["runs"].sum()) == 25 * 60 + 25 * 60

    def test_backward_no_assign_new(self):
        ld = 1000
        target = _rect_seg((100, 100), [(ld + 1, 10, 10, 30, 30)])
        match = _rect_seg((100, 100), [(ld + 5, 60, 60, 90, 90)])
        t_rle = pan_seg_to_rle_seg(target, [1], ld, [1])[1]
        m_rle = pan_seg_to_rle_seg(match, [1], ld, [1])[1]
        matcher = RLEMatcher(1, ld, assign_new=False)
        matcher.initialize_target(t_rle)
        out = matcher(m_rle)
        # unmatched object keeps its own label
        assert list(out.keys()) == list(m_rle.keys())


class TestTracker:
    @pytest.mark.parametrize("axis,axis_num", [("xy", 0), ("xz", 1),
                                               ("yz", 2)])
    def test_fill_reconstruction(self, rng, axis, axis_num):
        # random blobby label volume
        vol = (rng.random((40, 44, 48)) > 0.8).astype(np.int64)
        from scipy import ndimage
        lab, _ = ndimage.label(vol)
        vol = lab.astype(np.int64)
        ld = 100000

        tracker = InstanceTracker(1, ld, vol.shape, axis)
        for idx in range(vol.shape[axis_num]):
            sl = np.take(vol, idx, axis=axis_num)
            rle_seg = pan_seg_to_rle_seg(sl + (sl > 0) * 0, [0], ld, [],
                                         force_connected=False)
            # use raw labels: build instances dict for the slice
            inst = pan_seg_to_rle_seg(sl, [0], ld * 10, [],
                                      force_connected=False)[0]
            tracker.update(inst, idx)
        tracker.finish()

        out = numpy_fill_instances(np.zeros_like(vol), tracker.instances)
        assert np.array_equal(out, vol)

    def test_json_roundtrip(self, tmp_path, rng):
        vol = np.zeros((10, 12, 14), dtype=np.int64)
        vol[2:6, 3:8, 4:10] = 5
        tr = _mask_to_tracker(vol == 5, 5)
        p = tmp_path / "tr.json"
        tr.write_to_json(str(p))
        tr2 = InstanceTracker()
        tr2.load_from_json(str(p))
        assert set(tr2.instances) == {5}
        assert np.array_equal(tr2.instances[5]["starts"],
                              tr.instances[5]["starts"])
        assert tr2.shape3d == tr.shape3d

    def test_filters(self):
        vol = np.zeros((20, 20, 20), dtype=bool)
        vol[5:7, 5:7, 5:7] = True  # 8 voxels
        tr = _mask_to_tracker(vol, 1)
        vol2 = np.zeros((20, 20, 20), dtype=bool)
        vol2[2:18, 2:18, 2:18] = True
        tr.instances[2] = _mask_to_tracker(vol2, 2).instances[2]

        filters.remove_small_objects(tr, min_size=100)
        assert set(tr.instances) == {2}

        vol3 = np.zeros((20, 20, 20), dtype=bool)
        vol3[5:6, 2:18, 2:18] = True  # pancake: z-span 1
        tr.instances[3] = _mask_to_tracker(vol3, 3).instances[3]
        filters.remove_pancakes(tr, min_span=4)
        assert set(tr.instances) == {2}


class TestConsensus:
    def setup_method(self):
        self.shape = (48, 48, 48)
        self.ball1 = _ball_mask(self.shape, (24, 24, 24), 10)
        # slightly shifted copies: the xz/yz "views" of the same object
        self.ball2 = _ball_mask(self.shape, (24, 24, 26), 10)
        self.ball3 = _ball_mask(self.shape, (24, 26, 24), 10)

    def _trackers(self, masks):
        return [_mask_to_tracker(m, 1000 + i + 1)
                for i, m in enumerate(masks)]

    def test_identical_objects_full_consensus(self):
        trs = self._trackers([self.ball1, self.ball1, self.ball1])
        out = merge_objects_from_trackers(trs, pixel_vote_thr=2,
                                          cluster_iou_thr=0.75)
        assert len(out) == 1
        rec = numpy_fill_instances(np.zeros(self.shape, np.int64),
                                   {1: out[1]})
        assert np.array_equal(rec > 0, self.ball1)

    def test_vote_threshold_semantics(self):
        trs = self._trackers([self.ball1, self.ball2, self.ball3])
        out = merge_objects_from_trackers(trs, pixel_vote_thr=2,
                                          cluster_iou_thr=0.1)
        assert len(out) == 1
        votes = (self.ball1.astype(int) + self.ball2.astype(int)
                 + self.ball3.astype(int))
        rec = numpy_fill_instances(np.zeros(self.shape, np.int64),
                                   {1: out[1]})
        assert np.array_equal(rec > 0, votes >= 2)

    def test_single_tracker_object_dropped(self):
        lone = _ball_mask(self.shape, (10, 10, 10), 5)
        trs = self._trackers([self.ball1, self.ball2, self.ball3])
        # add lone object to tracker 0 only
        lone_tr = _mask_to_tracker(lone, 1099)
        trs[0].instances[1099] = lone_tr.instances[1099]
        out = merge_objects_from_trackers(trs, pixel_vote_thr=2,
                                          cluster_iou_thr=0.1)
        assert len(out) == 1  # lone object filtered (min_cluster_size=2)

    def test_bypass_keeps_single_tracker_object(self):
        lone = _ball_mask(self.shape, (10, 10, 10), 5)
        trs = self._trackers([self.ball1, self.ball2, self.ball3])
        lone_tr = _mask_to_tracker(lone, 1099)
        trs[0].instances[1099] = lone_tr.instances[1099]
        out = merge_objects_from_trackers(trs, pixel_vote_thr=1,
                                          cluster_iou_thr=0.1, bypass=True)
        assert len(out) == 2

    def test_semantic_vote(self):
        trs = self._trackers([self.ball1, self.ball2, self.ball3])
        out = merge_semantic_from_trackers(trs, pixel_vote_thr=2)
        votes = (self.ball1.astype(int) + self.ball2.astype(int)
                 + self.ball3.astype(int))
        rec = numpy_fill_instances(np.zeros(self.shape, np.int64),
                                   {1: out[1]})
        assert np.array_equal(rec > 0, votes >= 2)

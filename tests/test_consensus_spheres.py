"""Faithful port of the reference's consensus spec
(reference tests/test_consensus.py:19-195): overlapping spheres across
fake xy/xz/yz trackers, with EXACT expected output volumes for the
default / lower-cluster-thr / lower-pixel-thr / bypass instance consensus
and the semantic vote."""

import numpy as np
import pytest
from numpy.testing import assert_equal

from empanada_tpu.core.fill import numpy_fill_instances
from empanada_tpu.inference import consensus
from empanada_tpu.inference.rle import pan_seg_to_rle_seg
from empanada_tpu.inference.tracker import InstanceTracker


def ball(radius):
    """skimage.morphology.ball equivalent: (2r+1)^3 binary sphere."""
    n = 2 * radius + 1
    zz, yy, xx = np.mgrid[:n, :n, :n] - radius
    return (zz ** 2 + yy ** 2 + xx ** 2 <= radius ** 2).astype(np.uint32)


def make_spheres():
    s2 = ball(20)
    s4 = s2.copy()
    s4[:, 20:, 20:] = 0
    return s2, s4


SHAPE = (100, 100, 100)


@pytest.fixture
def object_trackers():
    s2, s4 = make_spheres()
    xy_vol = np.zeros(SHAPE, dtype=np.uint32)
    xz_vol = np.zeros(SHAPE, dtype=np.uint32)
    yz_vol = np.zeros(SHAPE, dtype=np.uint32)

    xy_vol[:41, :41, :41][s2 > 0] = s2[s2 > 0] * 1001
    xy_vol[15:56, 15:56, 15:56][s2 > 0] = s2[s2 > 0] * 1002

    xz_vol[:41, :41, :41][s2 > 0] = s2[s2 > 0] * 1005
    xz_vol[15:56, 15:56, 15:56][s4 > 0] = s4[s4 > 0] * 1004
    xz_vol[:41, 59:100, 59:100][s2 > 0] = s2[s2 > 0] * 1006

    yz_vol[:41, :41, :41][s2 > 0] = s2[s2 > 0] * 1003
    yz_vol[15:56, 15:56, 15:56][s4 > 0] = s4[s4 > 0] * 1003

    trackers = []
    for vol in (xy_vol, xz_vol, yz_vol):
        tr = InstanceTracker(1, 1000, SHAPE, axis="xy")
        for i, sl in enumerate(vol):
            rle_seg = pan_seg_to_rle_seg(sl, [1], 1000, [1],
                                         force_connected=False)
            tr.update(rle_seg[1], i)
        tr.finish()
        trackers.append(tr)
    return trackers


def _fill(instances):
    return numpy_fill_instances(np.zeros(SHAPE, dtype=np.uint32), instances)


def _expected(parts):
    s2, s4 = make_spheres()
    out = np.zeros(SHAPE, dtype=np.uint32)
    spheres = {"s2": s2, "s4": s4}
    for (region, sphere, label) in parts:
        s = spheres[sphere]
        out[region][s > 0] = s[s > 0] * label
    return out


R1 = np.s_[:41, :41, :41]
R2 = np.s_[15:56, 15:56, 15:56]
R3 = np.s_[:41, 59:100, 59:100]


class TestConsensusSpec:
    def test_default(self, object_trackers):
        cons = consensus.merge_objects_from_trackers(
            object_trackers, pixel_vote_thr=2, cluster_iou_thr=0.75,
            bypass=False)
        assert_equal(_fill(cons),
                     _expected([(R1, "s2", 1), (R2, "s4", 2)]))

    def test_lower_cluster_thr(self, object_trackers):
        cons = consensus.merge_objects_from_trackers(
            object_trackers, pixel_vote_thr=2, cluster_iou_thr=0.5,
            bypass=False)
        assert_equal(_fill(cons),
                     _expected([(R1, "s2", 1), (R2, "s4", 1)]))

    def test_lower_pixel_thr(self, object_trackers):
        cons = consensus.merge_objects_from_trackers(
            object_trackers, pixel_vote_thr=1, cluster_iou_thr=0.75,
            bypass=False)
        assert_equal(_fill(cons),
                     _expected([(R1, "s2", 1), (R2, "s2", 1)]))

    def test_bypass(self, object_trackers):
        cons = consensus.merge_objects_from_trackers(
            object_trackers, pixel_vote_thr=1, cluster_iou_thr=0.75,
            bypass=True)
        assert_equal(_fill(cons),
                     _expected([(R1, "s2", 1), (R2, "s2", 1),
                                (R3, "s2", 2)]))

    def _to_semantic(self, trackers):
        for tr in trackers:
            tr.instances = {1001: consensus.merge_instances(tr.instances)}
        return trackers

    def test_semantic_default(self, object_trackers):
        trackers = self._to_semantic(object_trackers)
        cons = consensus.merge_semantic_from_trackers(trackers,
                                                      pixel_vote_thr=2)
        assert_equal(_fill(cons),
                     _expected([(R1, "s2", 1), (R2, "s4", 1)]))

    def test_semantic_lower_thr(self, object_trackers):
        trackers = self._to_semantic(object_trackers)
        cons = consensus.merge_semantic_from_trackers(trackers,
                                                      pixel_vote_thr=1)
        assert_equal(_fill(cons),
                     _expected([(R1, "s2", 1), (R2, "s2", 1),
                                (R3, "s2", 1)]))

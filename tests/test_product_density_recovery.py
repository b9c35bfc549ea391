"""End-to-end object recovery at product instance density (round-4).

The round-4 512^3 device run exposed a catastrophic-looking collapse
(2400 GT objects -> 42 through consensus) that turned out to be a DATA
artifact: the legacy synthetic placement paints overlapping ellipsoids
with later-overwrites-earlier, carving objects into nested fragments
that IoA false-split healing (ours and the reference's,
reference inference/matcher.py:234-326) merges by design. On DISJOINT
instances — the real EM regime (organelles don't interpenetrate) — the
full GT-driven host pipeline recovers every object. These tests pin
both facts at product per-slice density so a regression in matching,
tracking, or consensus can't hide behind content again.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from empanada_tpu.core.ccl import image_to_runs
from empanada_tpu.data.synthetic import synthetic_em_volume
from empanada_tpu.inference import patterns
from empanada_tpu.inference.rle import runs_to_rle_seg

LD = 20000


def _run_gt_pipeline(gt, min_size=100, min_span=2):
    """Drive GT panoptic slices through matching, tracking, and
    orthoplane consensus (the host half of run_inference3d)."""
    axes = {"xy": 0, "xz": 1, "yz": 2}
    trackers = patterns.create_axis_trackers(axes, [1], LD, gt.shape)
    for axis_name, axis in axes.items():
        view = gt if axis == 0 else np.moveaxis(gt, axis, 0)
        matchers = patterns.create_matchers([1], LD, 0.25, 0.25)
        rle_stack = []
        for z in range(len(view)):
            pan = (view[z] + (view[z] > 0) * LD).astype(np.int32)
            s, e, v = image_to_runs(np.ascontiguousarray(pan))
            seg = runs_to_rle_seg(s, e, v, pan.shape, [1], LD, [1])
            rle_stack.append(patterns.apply_matchers(seg, matchers))
        patterns.finish_axis(rle_stack, matchers, trackers[axis_name],
                             len(view), min_size, min_span)
    consensus = patterns.build_consensus(
        trackers, [1], [1], mode="orthoplane", pixel_vote_thr=2,
        cluster_iou_thr=0.75, min_size=min_size, min_span=min_span)
    return consensus[1].instances


def test_disjoint_placement_is_disjoint_and_dense():
    _, gt = synthetic_em_volume((96, 128, 128), n_instances=120, seed=5,
                                overlap=False)
    labels, counts = np.unique(gt, return_counts=True)
    labels, counts = labels[labels > 0], counts[labels > 0]
    # every requested object exists and is a single connected ellipsoid
    assert len(labels) == 120
    assert counts.min() > 50
    per = [len(np.unique(gt[z][gt[z] > 0])) for z in range(0, 96, 8)]
    assert np.mean(per) > 15  # dense per-slice content


def test_tiny_cells_still_paint_every_instance():
    """Extreme density (grid cells under ~4 px): the radius floor must
    keep every placement at least one voxel — sub-voxel/negative radii
    used to silently drop ~half the requested instances."""
    _, gt = synthetic_em_volume((32, 32, 32), n_instances=600, seed=3,
                                overlap=False)
    labels = np.unique(gt)
    assert len(labels[labels > 0]) == 600


def test_full_recovery_at_product_density():
    """Every disjoint GT object above the size/span filters survives
    matching + tracking + 3-axis consensus, one-to-one."""
    _, gt = synthetic_em_volume((96, 128, 128), n_instances=120, seed=5,
                                overlap=False)
    gt = gt.astype(np.int32)
    instances = _run_gt_pipeline(gt)
    assert len(instances) == 120


def test_overlapping_content_collapse_is_data_artifact():
    """The legacy overlap placement at high density produces nested
    fragments whose IoA healing merges objects — document that this is
    content-driven: recovery is far below GT there, while the disjoint
    generator above recovers 100%."""
    _, gt = synthetic_em_volume((96, 128, 128), n_instances=120, seed=5,
                                overlap=True)
    gt = gt.astype(np.int32)
    n_gt = len(np.unique(gt[gt > 0]))
    instances = _run_gt_pipeline(gt)
    assert len(instances) < 0.6 * n_gt

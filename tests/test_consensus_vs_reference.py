"""Cross-implementation consensus parity: reference as oracle.

The round-3 e2e dig found that on identical tracker inputs our consensus
must match the reference's voxel-for-voxel (reference
empanada/inference/consensus.py:348-469) — and that the reference's axis
trackers emit UNSORTED RLEs (tracker.py finish() concatenates per-slice
starts), which our sorted-merge IoU math must canonicalize at ingestion
(core/rle.py canonicalize_rle). This test feeds the SAME reference
tracker objects to both consensus implementations across several
threshold regimes and asserts identical instance voxel sets.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SHAPE = (48, 64, 64)
LABEL_DIVISOR = 1000


def _ellipsoid_volumes(seed):
    """Three per-axis instance volumes with overlapping ellipsoids:
    near-identical objects across axes plus jitter so borderline
    0.75-IoU cluster edges are exercised."""
    rng = np.random.default_rng(seed)
    zz, yy, xx = np.mgrid[: SHAPE[0], : SHAPE[1], : SHAPE[2]]
    centers = [
        (12, 16, 16, 8, 10, 10),
        (20, 40, 28, 9, 11, 9),
        (34, 22, 44, 7, 9, 10),
        (30, 48, 50, 6, 8, 8),
        (16, 50, 12, 5, 7, 7),
    ]
    vols = []
    for _axis in range(3):
        vol = np.zeros(SHAPE, np.uint32)
        for i, (cz, cy, cx, rz, ry, rx) in enumerate(centers):
            jz, jy, jx = rng.integers(-2, 3, 3)
            ball = ((zz - cz - jz) ** 2 / rz ** 2
                    + (yy - cy - jy) ** 2 / ry ** 2
                    + (xx - cx - jx) ** 2 / rx ** 2) <= 1.0
            vol[ball] = LABEL_DIVISOR + i + 1
        vols.append(vol)
    # one axis drops an object entirely (vote_thr=2 must still keep it)
    vols[2][vols[2] == LABEL_DIVISOR + 3] = 0
    return vols


def _reference_trackers(vols):
    from tools.reference_pipeline import load_reference

    ref = load_reference()
    from empanada.inference.tracker import InstanceTracker  # noqa: E402

    trackers = []
    for axis_name, vol in zip(("xy", "xz", "yz"), vols):
        view = np.moveaxis(vol, ("xy", "xz", "yz").index(axis_name), 0)
        tr = InstanceTracker(1, LABEL_DIVISOR, SHAPE, axis=axis_name)
        for i in range(view.shape[0]):
            rle_seg = ref["pan_seg_to_rle_seg"](
                view[i], [1], LABEL_DIVISOR, [1], force_connected=False)
            if 1 in rle_seg:
                tr.update(rle_seg[1], i)
        tr.finish()
        trackers.append(tr)
    return trackers


def _voxel_signature(instances, fill):
    """Frozenset of per-instance flat-voxel frozensets."""
    sig = set()
    for attrs in instances.values():
        starts = np.asarray(attrs["starts"])
        runs = np.asarray(attrs["runs"])
        vox = np.concatenate(
            [np.arange(s, s + r) for s, r in zip(starts, runs)]
        ) if len(starts) else np.array([], np.int64)
        sig.add(frozenset(vox.tolist()))
    return frozenset(sig)


@pytest.mark.parametrize("pixel_vote_thr,cluster_iou_thr,bypass", [
    (2, 0.75, False),
    (2, 0.25, False),
    (1, 0.75, False),
    (1, 0.0, True),
])
def test_consensus_matches_reference_on_identical_trackers(
        pixel_vote_thr, cluster_iou_thr, bypass, monkeypatch):
    from tools.reference_pipeline import load_reference

    ref = load_reference()
    from empanada_tpu.inference import consensus

    vols = _ellipsoid_volumes(seed=3)
    trackers = _reference_trackers(vols)

    ref_tracker = ref["patterns"].create_instance_consensus(
        trackers, pixel_vote_thr, cluster_iou_thr, bypass)
    ours = consensus.merge_objects_from_trackers(
        trackers, pixel_vote_thr, cluster_iou_thr, bypass=bypass)

    ref_sig = _voxel_signature(ref_tracker.instances, None)
    our_sig = _voxel_signature(ours, None)
    assert ref_sig == our_sig, (
        f"thr=({pixel_vote_thr},{cluster_iou_thr},{bypass}): "
        f"{len(ref_tracker.instances)} ref vs {len(ours)} ours instances; "
        f"only-ref={len(ref_sig - our_sig)} only-ours={len(our_sig - ref_sig)}"
    )


def test_unsorted_reference_rles_are_canonicalized():
    """The reference's xz/yz trackers emit unsorted starts; our ingestion
    must sort+coalesce them or IoUs silently collapse to ~0."""
    vols = _ellipsoid_volumes(seed=5)
    trackers = _reference_trackers(vols)
    saw_unsorted = False
    for tr in trackers[1:]:
        for attrs in tr.instances.values():
            starts = np.asarray(attrs["starts"])
            if len(starts) > 1 and np.any(np.diff(starts) < 0):
                saw_unsorted = True
    assert saw_unsorted, "fixture no longer exercises the unsorted case"

    from empanada_tpu.core.rle import canonicalize_rle

    for tr in trackers:
        for attrs in tr.instances.values():
            s, r = canonicalize_rle(attrs["starts"], attrs["runs"])
            ends = s + r
            assert np.all(np.diff(s) > 0)
            assert np.all(s[1:] >= ends[:-1])
            assert r.sum() <= np.asarray(attrs["runs"]).sum()

"""Concurrent per-axis matching correctness (round-4 VERDICT next #5).

run_inference3d now (a) drains each axis's matcher queue on a background
thread so the next axis's device stream starts immediately after the last
dispatch, and (b) shards per-class matrix assembly across threads inside
ForwardMatcher. Both must be BIT-IDENTICAL to the serial composition —
matching is deterministic, so any divergence is a race.
"""

import numpy as np
import pytest

from empanada_tpu.inference import patterns


def _pan_two_class(rng, h=64, w=64, label_divisor=100):
    """Random two-thing-class panoptic map with a few square instances
    per class."""
    pan = np.zeros((h, w), np.int32)
    for class_id in (1, 2):
        for k in range(rng.integers(2, 5)):
            y = int(rng.integers(0, h - 12))
            x = int(rng.integers(0, w - 12))
            s = int(rng.integers(6, 12))
            pan[y:y + s, x:x + s] = class_id * label_divisor + k + 1
    return pan


class TestPerClassShardedMatcher:
    def test_bit_identical_to_serial(self):
        """ForwardMatcher with 2 thing classes (threaded per-class
        matching) == the serial apply_matchers loop, slice by slice."""
        label_divisor = 100
        labels = [1, 2]
        rng = np.random.default_rng(0)
        # drifting stacks so matching does real relabel/merge work
        pans = []
        base = _pan_two_class(rng)
        for i in range(12):
            pans.append(np.roll(base, (i, -i), axis=(0, 1)))
            if i % 4 == 3:  # periodically inject fresh instances
                base = _pan_two_class(rng)

        from empanada_tpu.inference.rle import pan_seg_to_rle_seg

        # serial reference: fresh matchers, inline loop
        serial_matchers = patterns.create_matchers(labels, label_divisor,
                                                   0.25, 0.25)
        serial_stack = []
        for pan in pans:
            seg = pan_seg_to_rle_seg(pan, labels, label_divisor, labels)
            serial_stack.append(
                patterns.apply_matchers(seg, serial_matchers))

        # threaded ForwardMatcher (per-class shard pool active: 2 classes)
        fm = patterns.ForwardMatcher(
            patterns.create_matchers(labels, label_divisor, 0.25, 0.25),
            labels, label_divisor, labels)
        assert fm._class_pool is not None
        for pan in pans:
            fm.put(pan)
        threaded_stack = fm.finish()

        assert len(threaded_stack) == len(serial_stack)
        for z, (a, b) in enumerate(zip(threaded_stack, serial_stack)):
            assert sorted(a) == sorted(b), z
            for class_id in a:
                assert sorted(a[class_id]) == sorted(b[class_id]), \
                    (z, class_id)
                for label in a[class_id]:
                    ia, ib = a[class_id][label], b[class_id][label]
                    assert np.array_equal(ia["starts"], ib["starts"]), \
                        (z, class_id, label)
                    assert np.array_equal(ia["runs"], ib["runs"]), \
                        (z, class_id, label)


@pytest.mark.slow
class TestOverlappedAxesBitIdentical:
    def test_orthoplane_equals_serial_composition(self):
        """run_inference3d (axis tails overlapped with the next axis's
        stream) == a hand-rolled fully-serial composition of the same
        primitives, down to exact consensus RLEs."""
        import sys

        sys.path.insert(0, ".")
        from tests.synthetic import SyntheticModule

        from empanada_tpu.cli.infer3d import run_inference3d
        from empanada_tpu.data import VolumeDataset
        from empanada_tpu.inference.fused import FusedStackEngine

        shape = (12, 34, 30)
        zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
        vol = (((zz - 6.0) ** 2 / 16 + (yy - 16.0) ** 2 / 81
                + (xx - 15.0) ** 2 / 49) <= 1.0).astype(np.float32)

        kwargs = dict(labels=[1], thing_list=[1], qlen=3,
                      label_divisor=100, min_size=4, min_span=1,
                      pixel_vote_thr=2)
        overlapped = run_inference3d(
            (SyntheticModule(), {}), vol, mode="orthoplane", block_size=4,
            padding_factor=16, max_centers=64, progress=False, **kwargs)

        # serial composition: stream -> finish -> tail, one axis at a time
        engine = FusedStackEngine(
            SyntheticModule(), {}, [1], block_size=4, label_divisor=100,
            median_kernel_size=3, padding_factor=16, max_centers=64,
            stuff_area=0)
        axes = {"xy": 0, "xz": 1, "yz": 2}
        trackers = patterns.create_axis_trackers(axes, [1], 100, shape)
        for axis_name, axis in axes.items():
            matchers = patterns.create_matchers([1], 100, 0.25, 0.25)
            fm = patterns.ForwardMatcher(matchers, [1], 100, [1])
            dataset = VolumeDataset(vol, axis=axis)
            for z_indices, pan_block, packed in engine.infer_blocks(
                    dataset):
                fm.put_block(z_indices, pan_block, packed)
            rle_stack = fm.finish()
            patterns.finish_axis(rle_stack, matchers,
                                 trackers[axis_name], len(dataset),
                                 4, 1)
        serial = patterns.build_consensus(
            trackers, [1], [1], mode="orthoplane", pixel_vote_thr=2,
            cluster_iou_thr=0.75, min_size=4, min_span=1)

        ins_o = overlapped[1].instances
        ins_s = serial[1].instances
        assert len(ins_s) >= 1
        assert sorted(ins_o) == sorted(ins_s)
        for label, attrs in ins_s.items():
            got = ins_o[label]
            assert tuple(attrs["box"]) == tuple(got["box"]), label
            assert np.array_equal(attrs["starts"], got["starts"]), label
            assert np.array_equal(attrs["runs"], got["runs"]), label

"""Engine + pipeline tests (median queue semantics, end-to-end stack
inference over synthetic geometry). The reference has no engine tests;
the median-queue behavior is specified by reference engines.py:47-90."""

import jax.numpy as jnp
import numpy as np
import pytest

from empanada_tpu.inference import patterns
from empanada_tpu.inference.engines import (
    _MedianQueue,
    PanopticDeepLabEngine,
    PanopticDeepLabEngine3d,
)
from empanada_tpu.ops.rle_device import extract_runs


class FakeModel:
    """Callable mimicking a jitted model: returns fixed maps per call."""

    def __init__(self, outputs):
        self.outputs = outputs
        self.i = 0

    def __call__(self, image, render_steps=2, interpolate_ins=True):
        out = self.outputs[self.i % len(self.outputs)]
        self.i += 1
        return out


def _synthetic_out(h=32, w=32, cy=16, cx=16, r=6, noise=False):
    """One forward-output dict with a disk instance at (cy, cx)."""
    yy, xx = np.mgrid[:h, :w]
    disk = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
    sem_logits = np.where(disk, 8.0, -8.0).astype(np.float32)
    if noise:
        # flip a block of pixels: median filtering should reject this
        sem_logits[:4, :4] = 8.0
    ctr = np.zeros((h, w), np.float32)
    ctr[cy, cx] = 1.0
    offsets = np.stack([cy - yy, cx - xx], axis=-1).astype(np.float32)
    return {
        "sem_logits": jnp.asarray(sem_logits)[None, :, :, None],
        "ctr_hmp": jnp.asarray(ctr)[None, :, :, None],
        "offsets": jnp.asarray(offsets)[None],
    }


class TestMedianQueue:
    def test_build_and_median(self):
        q = _MedianQueue(3)
        items = [{"sem": jnp.full((2, 2), float(i))} for i in range(5)]
        # first item: queue len 1 <= mid -> returns newest
        q.enqueue(items[0])
        assert q.get_next(["sem"]) is items[0]
        # len 2 < ks -> None while building
        q.enqueue(items[1])
        assert q.get_next(["sem"]) is None
        # full: middle item with median filtering
        q.enqueue(items[2])
        out = q.get_next(["sem"])
        np.testing.assert_allclose(np.asarray(out["sem"]), 1.0)
        q.enqueue(items[3])
        out = q.get_next(["sem"])
        np.testing.assert_allclose(np.asarray(out["sem"]), 2.0)
        # queue holds items [1, 2, 3]; only item 3 sits past the middle
        assert len(q.remaining()) == 1

    def test_even_kernel_rejected(self):
        with pytest.raises(AssertionError):
            _MedianQueue(4)


class TestPanopticDeepLabEngine:
    def test_single_instance(self):
        model = FakeModel([_synthetic_out()])
        engine = PanopticDeepLabEngine(
            model, thing_list=[1], label_divisor=100, stuff_area=0)
        pan = np.asarray(engine(jnp.zeros((1, 32, 32, 1))))
        ids = set(np.unique(pan))
        assert ids == {0, 101}
        assert (pan == 101).sum() > 80  # roughly the disk area

    def test_no_centers_gives_stuff_only(self):
        out = _synthetic_out()
        out["ctr_hmp"] = jnp.zeros_like(out["ctr_hmp"])
        engine = PanopticDeepLabEngine(
            FakeModel([out]), thing_list=[1], label_divisor=100)
        pan = np.asarray(engine(jnp.zeros((1, 32, 32, 1))))
        # thing pixels with no instance -> 0 instance id is dropped ->
        # thing class has no instance and the region becomes void
        assert 101 not in set(np.unique(pan))


class TestEngine3d:
    def test_median_rejects_impulse_noise(self):
        clean = _synthetic_out()
        noisy = _synthetic_out(noise=True)
        model = FakeModel([clean, noisy, clean, clean, clean])
        engine = PanopticDeepLabEngine3d(
            model, thing_list=[1], label_divisor=100, median_kernel_size=3)
        x = jnp.zeros((1, 32, 32, 1))
        segs = []
        for _ in range(5):
            pan = engine(x)
            if pan is not None:
                segs.append(np.asarray(pan))
        segs.extend(np.asarray(p) for p in engine.end())
        assert len(segs) == 5
        # slice 1 (the noisy forward) was median-filtered by neighbors:
        # the corner block must NOT appear as class-1
        assert not (segs[1][:4, :4] > 0).any()


class TestPipeline:
    def test_stack_pipeline_roundtrip(self):
        """Synthetic 3D stack: per-slice pan segs -> ForwardMatcher ->
        backward matching -> tracker -> fill reproduces a consistent
        instance volume."""
        d, h, w = 6, 40, 40
        label_divisor = 100
        pan_stack = np.zeros((d, h, w), np.int64)
        yy, xx = np.mgrid[:h, :w]
        # one drifting disk + one static square, both class 1
        for z in range(d):
            disk = ((yy - (10 + z)) ** 2 + (xx - 10) ** 2) <= 25
            pan_stack[z][disk] = 1 * label_divisor + 1
            pan_stack[z][25:35, 25:35] = 1 * label_divisor + 2

        matchers = patterns.create_matchers([1], label_divisor, 0.25, 0.25)
        fm = patterns.ForwardMatcher(matchers, [1], label_divisor, [1])
        for z in range(d):
            pan = jnp.asarray(pan_stack[z].astype(np.int32))
            runs = extract_runs(pan, max_runs=8 * h)
            fm.put((pan,) + runs)
        rle_stack = fm.finish()
        assert len(rle_stack) == d

        trackers = patterns.create_axis_trackers(
            {"xy": 0}, [1], label_divisor, (d, h, w))
        for rev_idx, rle_seg in patterns.backward_matching(
                rle_stack, matchers, d):
            patterns.update_trackers(rle_seg, rev_idx, trackers["xy"])
        patterns.finish_tracking(trackers["xy"])

        tr = trackers["xy"][0]
        assert len(tr.instances) == 2
        vol = np.zeros((d, h, w), np.int64)
        patterns.fill_volume(vol, tr.instances)
        # same voxels labeled, consistent ids per object across z
        assert set(np.unique(vol[pan_stack > 0])) == set(tr.instances)
        assert (vol > 0).sum() == (pan_stack > 0).sum()
        # the static square is one id across all slices
        sq_ids = np.unique(vol[:, 25:35, 25:35])
        assert len(sq_ids) == 1

    def test_apply_filters(self):
        tr = patterns.create_axis_trackers(
            {"xy": 0}, [1], 100, (4, 10, 10))["xy"][0]
        tr.instances = {
            101: {"box": (0, 0, 0, 4, 5, 5),
                  "starts": np.arange(0, 400, 2), "runs": np.ones(200, int)},
            102: {"box": (0, 0, 0, 1, 2, 2),
                  "starts": np.array([0]), "runs": np.array([3])},
        }
        tr.finished = True
        patterns.apply_filters(tr, [{"name": "remove_small_objects",
                                     "min_size": 10}])
        assert set(tr.instances) == {101}

"""Core sparse-library invariants, ported conceptually from the reference's
test_array_utils.py / test_tracking.py (synthetic geometry, randomized
set-operation ground truth via numpy set functions)."""

import numpy as np
import pytest

from empanada_tpu.core import (
    box_area,
    box_intersection,
    box_iou_dense,
    box_iou_pairs,
    merge_boxes,
    rle_encode,
    rle_decode,
    rle_to_string,
    string_to_rle,
    rle_intersection,
    rle_iou,
    rle_ioa,
    merge_rles,
    join_ranges,
    vote_by_ranges,
    invert_ranges,
    connected_components_2d,
    label_mask,
    region_props_from_runs,
    numpy_fill_instances,
    chunked_fill_instances,
)
from empanada_tpu.core.ccl import image_to_runs


def _random_index_set(rng, size=1000, max_index=5000):
    return np.unique(rng.choice(max_index, size=size, replace=False))


class TestBoxes:
    def test_area_2d_3d(self):
        boxes2d = np.array([[0, 0, 4, 5], [2, 3, 3, 10]])
        assert np.array_equal(box_area(boxes2d), [20, 7])
        boxes3d = np.array([[0, 0, 0, 2, 3, 4]])
        assert np.array_equal(box_area(boxes3d), [24])

    def test_intersection_and_iou(self):
        b1 = np.array([[0, 0, 10, 10]])
        b2 = np.array([[5, 5, 15, 15], [20, 20, 30, 30]])
        inter = box_intersection(b1, b2)
        assert inter[0, 0] == 25 and inter[0, 1] == 0
        iou = box_iou_dense(b1, b2)
        assert np.isclose(iou[0, 0], 25 / 175)
        assert iou[0, 1] == 0

    def test_pairs_matches_dense(self, rng):
        boxes = rng.integers(0, 50, size=(40, 2))
        boxes = np.concatenate([boxes, boxes + rng.integers(1, 30, (40, 2))], 1)
        dense = box_iou_dense(boxes)
        rows, cols, ious, inters = box_iou_pairs(boxes, block=7)
        sparse = np.zeros_like(dense)
        sparse[rows, cols] = ious
        nz = dense > 0
        assert np.allclose(sparse[nz], dense[nz])
        assert not np.any(sparse[~nz])

    def test_merge_boxes(self):
        assert merge_boxes((0, 1, 5, 6), (2, 0, 7, 3)) == (0, 0, 7, 6)


class TestRLE:
    def test_encode_decode_roundtrip(self, rng):
        idx = _random_index_set(rng)
        starts, runs = rle_encode(idx)
        assert np.array_equal(rle_decode(starts, runs), idx)

    def test_string_roundtrip(self, rng):
        idx = _random_index_set(rng)
        starts, runs = rle_encode(idx)
        s2, r2 = string_to_rle(rle_to_string(starts, runs))
        assert np.array_equal(s2, starts) and np.array_equal(r2, runs)

    def test_intersection_vs_numpy(self, rng):
        for _ in range(10):
            a = _random_index_set(rng, 800)
            b = _random_index_set(rng, 900)
            sa, ra = rle_encode(a)
            sb, rb = rle_encode(b)
            expected = len(np.intersect1d(a, b))
            assert rle_intersection(sa, ra, sb, rb) == expected

    def test_iou_ioa_vs_numpy(self, rng):
        a = _random_index_set(rng, 700)
        b = _random_index_set(rng, 1100)
        sa, ra = rle_encode(a)
        sb, rb = rle_encode(b)
        inter = len(np.intersect1d(a, b))
        union = len(np.union1d(a, b))
        assert np.isclose(rle_iou(sa, ra, sb, rb), inter / union)
        assert np.isclose(rle_ioa(sa, ra, sb, rb), inter / len(b))

    def test_merge_rles_vs_numpy(self, rng):
        a = _random_index_set(rng, 500)
        b = _random_index_set(rng, 600)
        sa, ra = rle_encode(a)
        sb, rb = rle_encode(b)
        ms, mr = merge_rles(sa, ra, sb, rb)
        assert np.array_equal(rle_decode(ms, mr), np.union1d(a, b))


class TestRanges:
    def test_vote_by_ranges_vs_counts(self, rng):
        # three overlapping random index sets; votes == occurrence counts
        sets = [_random_index_set(rng, 400, 2000) for _ in range(3)]
        ranges = []
        for s in sets:
            st, rn = rle_encode(s)
            ranges.append(np.stack([st, st + rn], axis=1))

        allv = np.concatenate(sets)
        vals, counts = np.unique(allv, return_counts=True)

        for thr in (1, 2, 3):
            voted = vote_by_ranges(ranges, thr)
            got = set()
            for s, e in voted:
                got.update(range(s, e))
            expected = set(vals[counts >= thr].tolist())
            assert got == expected, f"thr={thr}"

    def test_vote_too_few_sources(self):
        r = np.array([[0, 10]])
        assert len(vote_by_ranges([r], vote_thr=2)) == 0

    def test_join_and_invert(self):
        r1 = np.array([[0, 5], [8, 12]])
        r2 = np.array([[3, 9], [20, 25]])
        joined = join_ranges([r1, r2])
        assert np.array_equal(joined, [[0, 12], [20, 25]])
        inv = invert_ranges(joined, 30)
        assert np.array_equal(inv, [[12, 20], [25, 30]])
        inv2 = invert_ranges(np.array([[0, 30]]), 30)
        assert len(inv2) == 0


class TestCCL:
    def test_simple_components(self):
        img = np.zeros((10, 10), dtype=np.int32)
        img[1:3, 1:3] = 5
        img[6:9, 6:9] = 5
        out = connected_components_2d(img)
        assert len(np.unique(out)) == 3  # bg + 2 components
        assert len(np.unique(out[1:3, 1:3])) == 1
        assert len(np.unique(out[6:9, 6:9])) == 1
        assert np.unique(out[1:3, 1:3])[0] != np.unique(out[6:9, 6:9])[0]

    def test_diagonal_8conn(self):
        img = np.zeros((4, 4), dtype=np.int32)
        img[0, 0] = 1
        img[1, 1] = 1
        out = connected_components_2d(img, connectivity=8)
        assert out[0, 0] == out[1, 1] != 0
        out4 = connected_components_2d(img, connectivity=4)
        assert out4[0, 0] != out4[1, 1]

    def test_multilabel_separation(self):
        # touching regions of different values stay separate
        img = np.zeros((4, 6), dtype=np.int32)
        img[:, :3] = 1
        img[:, 3:] = 2
        out = connected_components_2d(img)
        assert len(np.unique(out)) == 2
        assert out[0, 0] != out[0, 5]

    def test_vs_scipy_label(self, rng):
        from scipy import ndimage
        mask = (rng.random((64, 64)) > 0.55).astype(np.int32)
        ours = label_mask(mask, connectivity=8)
        ref, n_ref = ndimage.label(mask, structure=np.ones((3, 3)))
        assert len(np.unique(ours)) - 1 == n_ref
        # same partition: bijection between label sets
        for lab in range(1, n_ref + 1):
            ours_vals = np.unique(ours[ref == lab])
            assert len(ours_vals) == 1 and ours_vals[0] != 0

    def test_region_props(self):
        img = np.zeros((8, 8), dtype=np.int32)
        img[2:5, 1:4] = 7
        starts, ends, values = image_to_runs(img)
        fg = values != 0
        props = region_props_from_runs(starts[fg], ends[fg],
                                       np.ones(fg.sum(), np.int32), img.shape)
        p = props[1]
        assert p["box"] == (2, 1, 5, 4)
        assert p["area"] == 9
        assert np.allclose(p["centroid"], (3.0, 2.0))
        # canonical RLE reconstructs the mask
        flat = np.zeros(64, dtype=np.int64)
        for s, r in zip(p["starts"], p["runs"]):
            flat[s:s + r] = 1
        assert np.array_equal(flat.reshape(8, 8), (img > 0).astype(np.int64))


class TestFill:
    def test_numpy_fill_roundtrip(self, rng):
        vol = rng.integers(0, 5, size=(20, 30, 40)).astype(np.int32)
        # encode each label then refill
        flat = vol.ravel()
        instances = {}
        for lab in range(1, 5):
            idx = np.nonzero(flat == lab)[0]
            if len(idx) == 0:
                continue
            s, r = rle_encode(idx)
            instances[lab] = {"starts": s, "runs": r}
        out = numpy_fill_instances(np.zeros_like(vol), instances)
        assert np.array_equal(out, vol * (vol > 0))

    @pytest.mark.parametrize("chunks", [(7, 11, 13), (20, 30, 40), (5, 5, 5)])
    def test_chunked_fill_matches_numpy(self, rng, chunks):
        vol = (rng.random((20, 30, 40)) > 0.7).astype(np.int32) * 3
        flat = vol.ravel()
        idx = np.nonzero(flat)[0]
        s, r = rle_encode(idx)
        instances = {3: {"starts": s, "runs": r}}
        dense = numpy_fill_instances(np.zeros_like(vol), instances)
        store = np.zeros_like(vol)
        chunked_fill_instances(store, instances, chunks=chunks)
        assert np.array_equal(store, dense)


def test_take_put_helpers():
    import numpy as np

    from empanada_tpu.core import put, take

    a = np.arange(24).reshape(2, 3, 4)
    np.testing.assert_array_equal(take(a, 1, axis=1), a[:, 1])
    np.testing.assert_array_equal(take(a, [0, 2], axis=2), a[:, :, [0, 2]])
    put(a, 0, 99, axis=2)
    assert (a[:, :, 0] == 99).all()


class TestKwayUnionSR:
    """Native k-way starts/runs union (core/native.py kway_union_sr and
    its consumer matcher.merge_attrs_many) vs the generic
    join_ranges-based union on random inputs — overlapping, abutting,
    disjoint, empty, and k=1..8."""

    @pytest.mark.parametrize("seed", range(8))
    def test_matches_join_ranges(self, seed):
        from empanada_tpu.core import native
        from empanada_tpu.core.ranges import join_ranges, ranges_to_rle

        if native.get_lib() is None or not hasattr(
                native.get_lib(), "etpu_kway_union_sr"):
            pytest.skip("native lib without etpu_kway_union_sr")
        rng = np.random.default_rng(seed)
        k = int(rng.integers(1, 9))
        starts_list, runs_list, ranges = [], [], []
        for _ in range(k):
            n = int(rng.integers(0, 40))
            idx = np.unique(rng.integers(0, 300, size=n))
            if len(idx) == 0:
                s = np.zeros(0, np.int64)
                r = np.zeros(0, np.int64)
            else:
                from empanada_tpu.core import rle_encode

                s, r = rle_encode(idx)
            starts_list.append(np.asarray(s, np.int64))
            runs_list.append(np.asarray(r, np.int64))
            ranges.append(np.stack([starts_list[-1],
                                    starts_list[-1] + runs_list[-1]],
                                   axis=1))
        offs = np.zeros(k + 1, np.int64)
        offs[1:] = np.cumsum([len(s) for s in starts_list])
        got = native.kway_union_sr(
            np.concatenate(starts_list) if k > 1 else starts_list[0],
            np.concatenate(runs_list) if k > 1 else runs_list[0], offs)
        expected = ranges_to_rle(join_ranges(ranges))
        np.testing.assert_array_equal(got[0], expected[:, 0])
        np.testing.assert_array_equal(got[1], expected[:, 1])

    def test_merge_attrs_many_unsorted_fallback(self):
        """Raw attrs (no _canon) with UNSORTED starts must still union
        correctly via the generic path."""
        from empanada_tpu.inference.matcher import merge_attrs_many

        a = {"box": (0, 0, 2, 2), "starts": np.array([10, 0]),
             "runs": np.array([5, 3])}
        b = {"box": (1, 1, 3, 3), "starts": np.array([4]),
             "runs": np.array([8])}
        out = merge_attrs_many([a, b])
        np.testing.assert_array_equal(out["starts"], [0, 4])
        np.testing.assert_array_equal(out["runs"], [3, 11])
        assert out["box"] == (0, 0, 3, 3)


class TestKwayVote:
    """Native one-pass k-way coverage vote vs the concat-sort + coverage
    sweep on random canonical inputs, every threshold."""

    @pytest.mark.parametrize("seed", range(8))
    def test_matches_coverage_sweep(self, seed):
        from empanada_tpu.core import native, rle_encode
        from empanada_tpu.core.ranges import (
            _coverage_ranges,
            concat_sort_ranges,
        )

        if native.get_lib() is None or not hasattr(
                native.get_lib(), "etpu_kway_vote"):
            pytest.skip("native lib without etpu_kway_vote")
        rng = np.random.default_rng(100 + seed)
        k = int(rng.integers(1, 7))
        lists = []
        for _ in range(k):
            idx = np.unique(rng.integers(0, 200, size=rng.integers(0, 50)))
            if len(idx) == 0:
                lists.append(np.zeros((0, 2), np.int64))
                continue
            s, r = rle_encode(idx)
            lists.append(np.stack([np.asarray(s, np.int64),
                                   np.asarray(s, np.int64)
                                   + np.asarray(r, np.int64)], axis=1))
        offs = np.zeros(k + 1, np.int64)
        offs[1:] = np.cumsum([len(r) for r in lists])
        cat = (np.concatenate(lists, axis=0) if k > 1 else lists[0])
        for thr in range(1, k + 2):
            got = native.kway_vote(cat, offs, thr)
            expected = _coverage_ranges(concat_sort_ranges(lists), thr)
            np.testing.assert_array_equal(got, expected, err_msg=f"thr={thr}")

    def test_vote_by_ranges_uses_identical_semantics(self):
        """Public vote_by_ranges must give the same answer whether or not
        the native fast path engages (unsorted input forces the generic
        sweep; sorting it engages the fast path)."""
        from empanada_tpu.core.ranges import vote_by_ranges

        a = np.array([[0, 5], [10, 20]], np.int64)
        b = np.array([[3, 12]], np.int64)
        a_unsorted = a[::-1].copy()
        got_fast = vote_by_ranges([a, b], 2)
        got_generic = vote_by_ranges([a_unsorted, b], 2)
        np.testing.assert_array_equal(got_fast, got_generic)
        np.testing.assert_array_equal(got_fast, [[3, 5], [10, 12]])


def test_kway_union_batch_matches_per_group():
    """Batched native unions (matcher.merge_attrs_batch) must equal
    per-group merge_attrs_many on random groups, including singletons
    and heavy overlap."""
    from empanada_tpu.core import rle_encode
    from empanada_tpu.inference.matcher import (
        merge_attrs_batch,
        merge_attrs_many,
    )

    rng = np.random.default_rng(3)
    groups = []
    for _ in range(12):
        lst = []
        for _ in range(int(rng.integers(1, 5))):
            idx = np.unique(rng.integers(0, 400, size=rng.integers(1, 60)))
            s, r = rle_encode(idx)
            s = np.asarray(s, np.int64)
            r = np.asarray(r, np.int64)
            lst.append({"box": (int(idx.min()), 0, int(idx.max()) + 1, 1),
                        "starts": s, "runs": r,
                        "_canon": (s, r, int(r.sum()), s)})
        groups.append(lst)
    got = merge_attrs_batch(groups)
    for g, lst in zip(got, groups):
        want = merge_attrs_many(list(lst))
        np.testing.assert_array_equal(g["starts"], want["starts"])
        np.testing.assert_array_equal(g["runs"], want["runs"])
        assert g["box"] == want["box"]

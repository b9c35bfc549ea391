"""Data stack tests: transforms, target creation, datasets, loader,
samplers, zarr store (reference test model: tests/test_data_post.py plus
invariants the reference lacks)."""

import os

import numpy as np
import pytest

from empanada_tpu.core.fill import chunked_fill_instances
from empanada_tpu.data import (
    DataLoader,
    SingleClassInstanceDataset,
    VolumeDataset,
)
from empanada_tpu.data.utils.sampler import (
    DistributedWeightedSampler,
    WeightedRandomSampler,
)
from empanada_tpu.data.utils.target_creation import (
    heatmap_and_offsets,
    seg_to_instance_bd,
)
from empanada_tpu.data.utils.transforms import (
    Compose,
    create_augmentations,
    factor_pad_numpy,
    resize_by_factor,
)
from empanada_tpu.data.zarr_store import create_zarr, open_zarr


class TestTransforms:
    def test_pipeline_shapes_and_dtype(self):
        tfs = create_augmentations([
            {"aug": "RandomScale", "scale_limit": [-0.5, 0.5]},
            {"aug": "PadIfNeeded", "min_height": 64, "min_width": 64,
             "border_mode": 0},
            {"aug": "RandomCrop", "height": 64, "width": 64},
            {"aug": "Rotate", "limit": 180, "border_mode": 0},
            {"aug": "RandomBrightnessContrast"},
            {"aug": "HorizontalFlip"},
            {"aug": "VerticalFlip"},
        ], norms={"mean": 0.5, "std": 0.2}, seed=1)
        img = (np.random.rand(90, 70, 1) * 255).astype(np.uint8)
        msk = (np.random.rand(90, 70) > 0.7).astype(np.int64)
        for _ in range(10):
            out = tfs(image=img, mask=msk)
            assert out["image"].shape == (64, 64, 1)
            assert out["mask"].shape == (64, 64)
            assert out["image"].dtype == np.float32
            # mask values preserved exactly (nearest interp)
            assert set(np.unique(out["mask"])) <= {0, 1}

    def test_mask_geometry_follows_image(self):
        from empanada_tpu.data.utils.transforms import HorizontalFlip

        tfs = Compose([HorizontalFlip(p=1.0)], seed=0)
        img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
        msk = np.arange(16).reshape(4, 4)
        out = tfs(image=img, mask=msk)
        np.testing.assert_array_equal(out["image"][..., 0], img[:, ::-1, 0])
        np.testing.assert_array_equal(out["mask"], msk[:, ::-1])

    def test_resize_and_factor_pad(self):
        img = np.zeros((100, 130), np.uint8)
        small = resize_by_factor(img, 4)
        assert small.shape == (25, 33)
        padded = factor_pad_numpy(small, 16)
        assert padded.shape == (32, 48)


class TestTargetCreation:
    def test_heatmap_offsets_roundtrip(self):
        m = np.zeros((64, 64), np.int64)
        m[10:20, 10:20] = 3
        m[40:50, 30:54] = 7
        hm, off = heatmap_and_offsets(m)
        assert hm.shape == (64, 64, 1)
        assert off.shape == (64, 64, 2)
        # heatmap peaks at centroids
        assert hm[14, 14, 0] == pytest.approx(1.0, abs=1e-4)
        # offsets point to the centroid: pixel + offset == centroid
        ys, xs = np.nonzero(m == 7)
        got_y = ys + off[ys, xs, 0]
        got_x = xs + off[ys, xs, 1]
        assert np.allclose(got_y, 44.5) and np.allclose(got_x, 41.5)
        # background offsets are zero
        assert off[m == 0].sum() == 0

    def test_contours_separate_instances(self):
        m = np.zeros((32, 32), np.int64)
        m[4:16, 4:28] = 1
        m[16:28, 4:28] = 2  # touching instances
        bd = seg_to_instance_bd(m[None])[0]
        # the touching boundary row must be contour
        assert bd[16, 10] == 1
        # deep interior is not contour
        assert bd[8, 16] == 0


def _make_instance_dataset(root, n_subdirs=2, n_imgs=3):
    import cv2

    for sd in range(n_subdirs):
        for d in ("images", "masks"):
            os.makedirs(os.path.join(root, f"ds{sd}", d), exist_ok=True)
        for i in range(n_imgs * (sd + 1)):
            img = (np.random.rand(48, 48) * 255).astype(np.uint8)
            msk = np.zeros((48, 48), np.uint16)
            msk[8:20, 8:20] = 1
            msk[30:44, 24:40] = 2
            cv2.imwrite(os.path.join(root, f"ds{sd}", "images", f"{i}.png"), img)
            cv2.imwrite(os.path.join(root, f"ds{sd}", "masks", f"{i}.png"), msk)
    return root


class TestDatasets:
    def test_single_class_instance(self, tmp_path):
        root = _make_instance_dataset(str(tmp_path))
        ds = SingleClassInstanceDataset(root, weight_gamma=0.3)
        assert len(ds) == 9
        ex = ds[0]
        assert ex["image"].shape == (48, 48, 1)
        assert ex["sem"].dtype == np.float32
        assert set(np.unique(ex["sem"])) == {0.0, 1.0}
        assert ex["ctr_hmp"].shape == (48, 48, 1)
        assert ex["offsets"].shape == (48, 48, 2)

    def test_dataset_addition_and_weights(self, tmp_path):
        r1 = _make_instance_dataset(str(tmp_path / "a"))
        r2 = _make_instance_dataset(str(tmp_path / "b"))
        d1 = SingleClassInstanceDataset(r1, weight_gamma=0.3)
        d2 = SingleClassInstanceDataset(r2, weight_gamma=0.3)
        merged = d1 + d2
        assert len(merged) == 18
        assert merged.weights is not None and len(merged.weights) == 18
        # smaller subdirs get larger weights
        w = dict(zip(merged.impaths, merged.weights))
        small = [p for p in merged.impaths if "/ds0/" in p][0]
        big = [p for p in merged.impaths if "/ds1/" in p][0]
        assert w[small] > w[big]

    def test_loader_batches(self, tmp_path):
        root = _make_instance_dataset(str(tmp_path))
        ds = SingleClassInstanceDataset(root)
        loader = DataLoader(ds, batch_size=4, shuffle=True, drop_last=True,
                            num_workers=2)
        batches = list(loader)
        assert len(batches) == len(loader) == 2
        b = batches[0]
        assert b["image"].shape == (4, 48, 48, 1)
        assert b["sem"].shape == (4, 48, 48)
        assert b["offsets"].shape == (4, 48, 48, 2)

    def test_volume_dataset(self):
        vol = np.random.randint(0, 255, (5, 40, 40), np.uint8)
        ds = VolumeDataset(vol, axis=1, scale=2)
        assert len(ds) == 40
        ex = ds[3]
        assert ex["size"] == (5, 40)
        assert ex["image"].shape == (3, 20)


class TestSamplers:
    def test_distributed_weighted_partition(self):
        n = 64
        weights = np.ones(n)
        draws = []
        for rank in range(4):
            s = DistributedWeightedSampler(n, weights, num_replicas=4,
                                           rank=rank)
            s.set_epoch(3)
            idx = list(s)
            assert len(idx) == 16
            draws.append(set(idx))
        # ranks draw from disjoint strided subsets
        for i in range(4):
            for j in range(i + 1, 4):
                assert not (draws[i] & draws[j])

    def test_weighted_sampler_bias(self):
        w = np.array([10.0] + [0.01] * 9)
        s = WeightedRandomSampler(w, num_samples=1000, seed=1)
        counts = np.bincount(list(s), minlength=10)
        assert counts[0] > 800

    def test_epoch_determinism(self):
        s = DistributedWeightedSampler(32, np.ones(32), num_replicas=2,
                                       rank=0)
        s.set_epoch(5)
        a = list(s)
        s.set_epoch(5)
        assert list(s) == a
        s.set_epoch(6)
        assert list(s) != a


class TestZarrStore:
    def test_roundtrip_and_partial_io(self, tmp_path):
        p = str(tmp_path / "v.zarr")
        z = create_zarr(p, (9, 21, 17), chunks=(4, 8, 8), dtype=np.uint32)
        vol = (np.random.rand(9, 21, 17) * 99).astype(np.uint32)
        z[:, :, :] = vol
        re = open_zarr(p)
        np.testing.assert_array_equal(np.asarray(re), vol)
        np.testing.assert_array_equal(re[2:7, 3:19, 5:17],
                                      vol[2:7, 3:19, 5:17])
        re[0:2, 0:5, 0:5] = 3
        vol[0:2, 0:5, 0:5] = 3
        np.testing.assert_array_equal(np.asarray(open_zarr(p)), vol)

    def test_overwrite_clears_stale_chunks(self, tmp_path):
        # re-creating with overwrite=True over an old store with a
        # DIFFERENT chunk layout must not read back stale chunk files
        p = str(tmp_path / "o.zarr")
        z = create_zarr(p, (8, 32, 32), chunks=(8, 32, 32))
        z[:, :, :] = 7
        z2 = create_zarr(p, (8, 32, 32), chunks=(4, 32, 32),
                         overwrite=True)
        np.testing.assert_array_equal(np.asarray(z2), 0)
        z2[1:3, :, :] = 5
        assert (np.asarray(open_zarr(p))[1:3] == 5).all()

    def test_chunked_fill_on_zarr(self, tmp_path):
        shape = (6, 10, 10)
        z = create_zarr(str(tmp_path / "f.zarr"), shape, chunks=(2, 3, 7),
                        dtype=np.uint32)
        starts = np.array([0, 55, 599])
        runs = np.array([7, 100, 1])
        chunked_fill_instances(z, {9: {"starts": starts, "runs": runs}},
                               processes=2)
        ref = np.zeros(np.prod(shape), np.uint32)
        for s, r in zip(starts, runs):
            ref[s:s + r] = 9
        np.testing.assert_array_equal(np.asarray(z).ravel(), ref)

    def test_chunked_fill_fuzz_chunk_shapes(self, tmp_path, rng):
        """Random instances filled through 20 random chunk shapes must
        reconstruct the dense volume exactly (the reference's zarr fill
        fuzzing, tests/test_tracking.py:58-72)."""
        shape = (12, 17, 23)
        n_vox = int(np.prod(shape))
        # random instance RLEs from a random label volume
        labelvol = rng.integers(0, 4, n_vox)
        instances = {}
        for lab in (1, 2, 3):
            coords = np.nonzero(labelvol == lab)[0]
            if len(coords) == 0:
                continue
            diffs = np.diff(coords)
            breaks = np.nonzero(diffs > 1)[0]
            starts = np.concatenate([[coords[0]], coords[breaks + 1]])
            ends = np.concatenate([coords[breaks], [coords[-1]]]) + 1
            instances[lab] = {"starts": starts, "runs": ends - starts}
        dense = labelvol.reshape(shape).astype(np.uint32)

        for trial in range(20):
            chunks = tuple(int(rng.integers(1, s + 1)) for s in shape)
            z = create_zarr(str(tmp_path / f"fz{trial}.zarr"), shape,
                            chunks=chunks, dtype=np.uint32)
            chunked_fill_instances(z, instances, processes=2)
            np.testing.assert_array_equal(
                np.asarray(z), dense, err_msg=f"chunks={chunks}")


class TestComposeThreadSafety:
    def test_parallel_draws(self):
        """Loader worker threads must get independent RNG streams
        (numpy Generators are not thread-safe)."""
        import threading

        from empanada_tpu.data.utils.transforms import Compose, RandomCrop

        tfs = Compose([RandomCrop(8, 8)], seed=0)
        img = np.arange(400, dtype=np.uint8).reshape(20, 20)
        results = [[] for _ in range(8)]

        def work(i):
            for _ in range(50):
                results[i].append(int(tfs(image=img)["image"].sum()))

        threads = [threading.Thread(target=work, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sum(len(r) for r in results) == 400
        # streams differ across threads (no lock-step duplication)
        assert len({tuple(r) for r in results}) > 1

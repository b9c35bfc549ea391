"""Dataset-curation toolkit (reference mitonet data-ops scripts):
perceptual dedup, flipbooks, proofread-stack splitting, batch
organization round trips, and the TPU-batched patch-quality filter."""

import json
import os

import numpy as np
import pytest

from empanada_tpu.data import curation as cur


class TestHashDedup:
    def test_dhash_near_duplicates_close(self):
        rng = np.random.default_rng(0)
        base = rng.integers(0, 255, (256, 256)).astype(np.uint8)
        noisy = np.clip(base.astype(int)
                        + rng.integers(-4, 5, base.shape), 0, 255)
        other = rng.integers(0, 255, (256, 256)).astype(np.uint8)
        h0, h1, h2 = (cur.dhash(x) for x in (base, noisy, other))
        d_near = np.logical_xor(h0, h1).sum()
        d_far = np.logical_xor(h0, h2).sum()
        assert d_near < d_far
        assert d_near <= 12

    def test_patch_grid_covers_image(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (300, 520)).astype(np.uint8)
        msk = (img > 200).astype(np.uint16)
        pd = cur.patch_and_hash(img, msk, crop_size=256)
        # round(300/256)=1 row, round(520/256)=2 cols
        assert len(pd["patches"]) == 2
        total = sum(p.size for p in pd["patches"])
        assert total == img.size
        assert all(pm.shape == p.shape
                   for pm, p in zip(pd["patch_masks"], pd["patches"]))

    def test_deduplicate_collapses_duplicates(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 255, (128, 128)).astype(np.uint8)
        b = rng.integers(0, 255, (128, 128)).astype(np.uint8)
        hashes = [cur.dhash(a), cur.dhash(a), cur.dhash(b),
                  cur.dhash(np.clip(a.astype(int) + 2, 0, 255))]
        keep = cur.deduplicate_hashes(hashes, min_distance=10, seed=3)
        # one exemplar for the a-family, one for b
        assert len(keep) == 2
        fams = {tuple(np.asarray(hashes[i]).ravel()[:8].tolist())
                for i in keep}
        assert len(fams) == 2


class TestFlipbooks:
    def test_shapes_and_border_padding(self):
        vol = np.arange(10 * 40 * 40, dtype=np.uint8).reshape(10, 40, 40)
        books = cur.flipbooks_from_locations(
            vol, [(5, 20, 20), (0, 0, 0)], span=5, size=16)
        assert books.shape == (2, 5, 16, 16)
        # centered crop reproduces the source
        assert np.array_equal(books[0, 2], vol[5, 12:28, 12:28])
        # border book: slices before z=0 and the off-volume ring are zero
        assert books[1, :2].sum() == 0
        assert np.array_equal(books[1, 2, 8:, 8:], vol[0, :8, :8])


class TestProofreadRoundTrip:
    def test_split_merge_group(self, tmp_path):
        rng = np.random.default_rng(4)
        span, n_books = 3, 4
        h = w = 32
        image = rng.integers(1, 255, (span * n_books, h, w), np.uint8)
        mask = rng.integers(0, 5, (span * n_books, h, w), np.uint8)
        attrs = [
            {"image_name": f"dsA-LOC-2d-{i}.jpg", "start": i * span,
             "end": i * span + span - 1, "median_confidence": 3 + (i % 2),
             "height": h, "width": w}
            for i in range(n_books)
        ]
        attrs[-1]["image_name"] = "dsB-ROI-7.jpg"

        batch = tmp_path / "batch"
        written = cur.split_proof_stack(image, mask, attrs, str(batch),
                                        ignore={1})
        assert len(written) == n_books - 1
        # middle slice content round-trips
        import cv2

        im0 = cv2.imread(str(batch / "images" / f"{written[0]}.tiff"),
                         cv2.IMREAD_UNCHANGED)
        assert np.array_equal(im0, image[1])

        dst = tmp_path / "train"
        touched = cur.merge_annotation_batch(str(batch), str(dst))
        assert touched == ["dsA", "dsB"]
        with open(dst / "dsA" / "confidences.json") as f:
            conf = json.load(f)
        assert len(conf) == 2 and all(v in (3, 4) for v in conf.values())
        assert len(os.listdir(dst / "dsA" / "images")) == 2
        assert len(os.listdir(dst / "dsB" / "masks")) == 1

        # regroup: pretend dsB was a randomized prefix for dsA
        cur.group_annotation_dirs(str(dst), {"dsB": "dsA"})
        with open(dst / "dsA" / "confidences.json") as f:
            conf = json.load(f)
        assert len(conf) == 3
        assert len(os.listdir(dst / "dsA" / "images")) == 3


class TestQualityFilter:
    def test_separates_blank_from_textured(self):
        rng = np.random.default_rng(5)
        textured = [rng.integers(0, 255, (64, 64)).astype(np.uint8)
                    for _ in range(4)]
        blank = [np.full((64, 64), 60, np.uint8) for _ in range(4)]

        filt = cur.PatchQualityFilter(encoder="resnet18", imsize=64)
        scores = filt.predict(textured + blank, batch_size=8)
        assert scores.shape == (8,)
        assert np.isfinite(scores).all()
        # keep_frac=0 -> filter is pure thresholding
        keep, drop, s = filt.filter(textured + blank, confidence_thr=0.0,
                                    keep_frac=0.0)
        assert len(keep) == 8 and len(drop) == 0

    def test_cli_roundtrip(self, tmp_path):
        from empanada_tpu.cli.curate import main as curate_main

        vol = np.random.default_rng(6).integers(
            0, 255, (6, 32, 32), np.uint8)
        np.save(tmp_path / "vol.npy", vol)
        with open(tmp_path / "locs.json", "w") as f:
            json.dump([[3, 16, 16]], f)
        curate_main(["flipbooks", str(tmp_path / "vol.npy"),
                     str(tmp_path / "locs.json"),
                     str(tmp_path / "books.npy"), "--span", "3",
                     "--size", "16"])
        books = np.load(tmp_path / "books.npy")
        assert books.shape == (1, 3, 16, 16)

"""Device panoptic-postprocess parity tests.

The oracle is the reference's torch implementation imported from
/root/reference (pure torch module, no copying). Skipped when the
reference tree or torch is unavailable — the behavioral tests below the
parity class still cover the semantics standalone.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from empanada_tpu.ops.postprocess import (
    find_instance_centers,
    group_pixels,
    get_panoptic_segmentation,
    harden_semantic,
    logits_to_prob,
)

try:
    sys.path.insert(0, "/root/reference")
    import torch
    from empanada.inference.postprocess import (
        get_panoptic_segmentation as torch_pps,
        find_instance_center as torch_fic,
        group_pixels as torch_gp,
    )
    HAVE_ORACLE = True
except Exception:  # pragma: no cover
    HAVE_ORACLE = False

needs_oracle = pytest.mark.skipif(not HAVE_ORACLE, reason="no torch oracle")


def _synthetic_outputs(rng, h=64, w=64, n_blobs=4, num_classes=1):
    """Build heatmap/offsets/sem for a few gaussian blobs."""
    ctr_hmp = np.zeros((h, w), np.float32)
    offsets = np.zeros((h, w, 2), np.float32)
    sem = np.zeros((h, w), np.float32)

    centers = []
    for _ in range(n_blobs):
        cy, cx = rng.integers(8, h - 8), rng.integers(8, w - 8)
        centers.append((cy, cx))

    yy, xx = np.mgrid[:h, :w]
    # each pixel belongs to its nearest center within radius
    d2 = np.stack([(yy - cy) ** 2 + (xx - cx) ** 2 for cy, cx in centers])
    nearest = np.argmin(d2, 0)
    in_blob = np.min(d2, 0) < 36
    sem[in_blob] = 1.0
    for i, (cy, cx) in enumerate(centers):
        m = (nearest == i) & in_blob
        offsets[m, 0] = cy - yy[m]
        offsets[m, 1] = cx - xx[m]
        ctr_hmp += np.exp(-d2[i] / 18.0)

    ctr_hmp = ctr_hmp / max(ctr_hmp.max(), 1e-5)
    return ctr_hmp, offsets, sem


class TestCentersParity:
    @needs_oracle
    def test_vs_torch(self, rng):
        for _ in range(5):
            hmp, _, _ = _synthetic_outputs(rng)
            ours_c, ours_v = find_instance_centers(
                jnp.asarray(hmp), threshold=0.1, nms_kernel=7, max_centers=64)
            ours = np.asarray(ours_c)[np.asarray(ours_v)]

            t = torch.from_numpy(hmp)[None, None]
            ref = torch_fic(t, threshold=0.1, nms_kernel=7).numpy()

            assert len(ours) == len(ref)
            # same set of (y, x); ordering differs (ours is score-sorted)
            ours_set = set(map(tuple, ours.tolist()))
            ref_set = set(map(tuple, ref.tolist()))
            assert ours_set == ref_set


class TestGroupPixelsParity:
    @needs_oracle
    @pytest.mark.parametrize("chunk", [64, 2])  # force the scan path too
    def test_vs_torch(self, rng, chunk):
        hmp, offsets, _ = _synthetic_outputs(rng, n_blobs=6)
        t = torch.from_numpy(hmp)[None, None]
        ref_ctr = torch_fic(t, threshold=0.1, nms_kernel=7)
        if len(ref_ctr) == 0:
            pytest.skip("no centers in synthetic input")
        t_off = torch.from_numpy(offsets.transpose(2, 0, 1))[None]
        ref_ids = torch_gp(ref_ctr, t_off, chunksize=1000)[0].numpy()

        # feed ours the same centers in the same order
        k = 64
        centers = np.zeros((k, 2), np.int32)
        centers[:len(ref_ctr)] = ref_ctr.numpy()
        valid = np.zeros(k, bool)
        valid[:len(ref_ctr)] = True
        ours = np.asarray(group_pixels(
            jnp.asarray(centers), jnp.asarray(valid), jnp.asarray(offsets),
            chunk=chunk))
        assert (ours == ref_ids).mean() > 0.999  # fp tie-breaks may differ


class TestPanopticParity:
    @needs_oracle
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_full_pipeline_binary(self, seed):
        rng = np.random.default_rng(seed)
        hmp, offsets, sem = _synthetic_outputs(rng, n_blobs=5)

        sem_prob = sem * 0.9 + 0.05  # confident probabilities

        ours = np.asarray(get_panoptic_segmentation(
            jnp.asarray(sem_prob[..., None]),
            jnp.asarray(hmp),
            jnp.asarray(offsets),
            thing_list=[1],
            label_divisor=1000,
            stuff_area=64,
            void_label=0,
            threshold=0.1,
            nms_kernel=7,
            max_centers=64,
        ))

        t_sem = torch.from_numpy((sem_prob >= 0.5).astype(np.int64))[None, None]
        t_hmp = torch.from_numpy(hmp)[None, None]
        t_off = torch.from_numpy(offsets.transpose(2, 0, 1))[None]
        ref, _ = torch_pps(t_sem, t_hmp, t_off, thing_list=[1],
                           label_divisor=1000, stuff_area=64, void_label=0,
                           threshold=0.1, nms_kernel=7)
        ref = ref[0].numpy()

        # identical up to fp tie-breaking at instance boundaries
        assert (ours == ref).mean() > 0.995

    @needs_oracle
    def test_full_pipeline_multiclass(self):
        rng = np.random.default_rng(3)
        hmp, offsets, sem = _synthetic_outputs(rng, n_blobs=4)
        # classes: 0 bg, 1 thing, 2 stuff
        sem_cls = sem.astype(np.int64)
        sem_cls[:8, :8] = 2  # a stuff patch (area 64)
        probs = np.zeros((64, 64, 3), np.float32)
        probs[np.arange(64)[:, None], np.arange(64)[None, :], sem_cls] = 1.0

        ours = np.asarray(get_panoptic_segmentation(
            jnp.asarray(probs), jnp.asarray(hmp), jnp.asarray(offsets),
            thing_list=[1], label_divisor=1000, stuff_area=32, void_label=0,
            threshold=0.1, nms_kernel=7, max_centers=64))

        t_sem = torch.from_numpy(sem_cls)[None, None]
        t_hmp = torch.from_numpy(hmp)[None, None]
        t_off = torch.from_numpy(offsets.transpose(2, 0, 1))[None]
        ref, _ = torch_pps(t_sem, t_hmp, t_off, thing_list=[1],
                           label_divisor=1000, stuff_area=32, void_label=0,
                           threshold=0.1, nms_kernel=7)
        assert (ours == ref[0].numpy()).mean() > 0.995


class TestStandalone:
    def test_harden(self):
        p = jnp.asarray(np.array([[[0.4], [0.6]]], np.float32))
        assert np.array_equal(np.asarray(harden_semantic(p)), [[0, 1]])

    def test_no_centers_all_stuff_or_void(self, rng):
        hmp = np.zeros((32, 32), np.float32)
        offsets = np.zeros((32, 32, 2), np.float32)
        sem_prob = np.full((32, 32, 1), 0.9, np.float32)
        pan = np.asarray(get_panoptic_segmentation(
            jnp.asarray(sem_prob), jnp.asarray(hmp), jnp.asarray(offsets),
            thing_list=[1], label_divisor=100, stuff_area=10, void_label=0,
            max_centers=16))
        # thing pixels with no centers stay void
        assert (pan == 0).all()


def test_coarse_merge_matches_full():
    """merge_semantic_and_instance_coarse must equal the full-resolution
    merge when instance cells are block-constant (the render path)."""
    import jax.numpy as jnp

    from empanada_tpu.ops.postprocess import (
        merge_semantic_and_instance,
        merge_semantic_and_instance_coarse,
    )

    rng = np.random.default_rng(0)
    scale = 4
    hc = wc = 16
    H = W = hc * scale
    num_classes = 3
    max_centers = 16
    thing_table = jnp.asarray(np.array([False, True, False]))  # class 1 thing

    for trial in range(3):
        ins_coarse = jnp.asarray(
            rng.integers(0, max_centers + 1, (hc, wc)).astype(np.int32))
        sem = jnp.asarray(
            rng.integers(0, num_classes, (H, W)).astype(np.int32))
        ins_full = jnp.repeat(jnp.repeat(ins_coarse, scale, 0), scale, 1)

        full = merge_semantic_and_instance(
            sem, jnp.where(thing_table[sem], ins_full, 0), 1000,
            thing_table, 64, 0, max_centers, num_classes)
        coarse = merge_semantic_and_instance_coarse(
            sem, ins_coarse, scale, 1000, thing_table, 64, 0,
            max_centers, num_classes)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(coarse),
                                      err_msg=f"trial {trial}")


class TestSmallTableLookup:
    def test_digit_lookup_exact_large_values(self):
        """The paint-table lookup must be exact for production pan ids
        (class * label_divisor + id can exceed bf16's 256-integer exact
        range; the digit split keeps each matmul operand <= 255).
        Verified exact on the real TPU 2026-08-17; this pins the CPU
        semantics."""
        from empanada_tpu.ops.postprocess import _small_table_lookup_int

        rng = np.random.default_rng(0)
        n = 257
        table = jnp.asarray(rng.integers(0, 65536, (n,), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, n, (5000,), dtype=np.int32))
        got = np.asarray(jax.jit(
            lambda t, i: _small_table_lookup_int(t, i, n))(table, idx))
        want = np.asarray(table)[np.asarray(idx)]
        assert np.array_equal(got, want)


def test_group_pixels_no_valid_centers_returns_zero():
    # contract: ids are 0 only/always when no valid centers survive NMS
    # (reference get_instance_segmentation returns zeros on empty ctr);
    # covers the fused slab, small-k, and scan paths
    from empanada_tpu.ops.postprocess import group_pixels

    offsets = jnp.asarray(np.random.default_rng(0).normal(
        size=(16, 16, 2)).astype(np.float32))
    for k, chunk in [(64, 64), (8, 64), (64, 2)]:
        centers = jnp.zeros((k, 2), jnp.int32)
        valid = jnp.zeros((k,), bool)
        ids = np.asarray(group_pixels(centers, valid, offsets, chunk=chunk))
        assert (ids == 0).all(), (k, chunk)

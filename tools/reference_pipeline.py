"""Run the ACTUAL reference 3D inference pipeline in-process.

Imports /root/reference's own engine + RLE/matcher/tracker/consensus host
stack and replays scripts/pdl_inference3d.py:58-240 faithfully (the
mp.Queue forward-matching process is run inline — identical semantics,
sequential). Used by tools/parity_e2e.py and tests/test_parity_e2e.py to
measure the END-TO-END PQ/F1 delta between the reference product flow
and cli/infer3d.run_inference3d on shared (converted) weights.

The reference's optional-speedup deps that are absent in this image are
stubbed with exact-semantics replacements, NOT approximations:
- numba: @numba.jit runs the reference's own loop bodies in pure python
  (slow, same arithmetic)
- skimage.measure.label: per-value 8-connected labeling via
  scipy.ndimage (the skimage contract for labeled input); regionprops
  exposes the .label/.bbox/.coords attributes the reference reads
- zarr: module placeholder so isinstance checks resolve (all arrays
  here are numpy)
"""

from __future__ import annotations

import sys
import types

import numpy as np


def _install_stubs():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def jit(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]

            def deco(fn):
                return fn

            return deco

        numba.jit = jit
        numba.njit = jit
        sys.modules["numba"] = numba

    if "zarr" not in sys.modules:
        zarr = types.ModuleType("zarr")

        class Array:  # placeholder for isinstance checks only
            pass

        zarr.Array = Array
        zarr.core = types.ModuleType("zarr.core")
        zarr.core.Array = Array
        sys.modules["zarr"] = zarr
        sys.modules["zarr.core"] = zarr.core

    if "skimage" not in sys.modules or not hasattr(
            sys.modules.get("skimage"), "measure"):
        from scipy import ndimage

        skimage = types.ModuleType("skimage")
        measure = types.ModuleType("skimage.measure")

        def label(seg):
            """8-connected components of each distinct nonzero value
            (skimage.measure.label semantics for labeled input)."""
            seg = np.asarray(seg)
            out = np.zeros(seg.shape, np.int32)
            nxt = 0
            structure = np.ones((3,) * seg.ndim)
            for v in np.unique(seg):
                if v == 0:
                    continue
                lab, n = ndimage.label(seg == v, structure=structure)
                out[lab > 0] = lab[lab > 0] + nxt
                nxt += n
            return out

        class _RegionProps:
            def __init__(self, lbl, bbox, coords):
                self.label = lbl
                self.bbox = bbox
                self.coords = coords

        def regionprops(seg):
            seg = np.asarray(seg)
            rps = []
            for v in np.unique(seg):
                if v == 0:
                    continue
                coords = np.stack(np.nonzero(seg == v), axis=1)
                lo = coords.min(0)
                hi = coords.max(0) + 1
                bbox = tuple(int(x) for x in lo) + tuple(int(x) for x in hi)
                rps.append(_RegionProps(int(v), bbox, coords))
            return rps

        measure.label = label
        measure.regionprops = regionprops
        skimage.measure = measure
        sys.modules["skimage"] = skimage
        sys.modules["skimage.measure"] = measure


def load_reference():
    """Install stubs, put /root/reference on the path, import the
    reference host stack. Returns the module namespace dict."""
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")

    from empanada.inference import filters  # noqa: E402
    from empanada.inference import patterns  # noqa: E402
    from empanada.inference.engines import (  # noqa: E402
        PanopticDeepLabRenderEngine3d,
    )
    from empanada.inference.rle import pan_seg_to_rle_seg  # noqa: E402

    return {
        "patterns": patterns,
        "filters": filters,
        "engine_cls": PanopticDeepLabRenderEngine3d,
        "pan_seg_to_rle_seg": pan_seg_to_rle_seg,
    }


def run_reference_inference3d(
    tmodel, volume, *, labels=(1,), thing_list=(1,), mode="orthoplane",
    qlen=3, label_divisor=1000, seg_thr=0.5, nms_thr=0.1, nms_kernel=3,
    iou_thr=0.25, ioa_thr=0.25, pixel_vote_thr=2, cluster_iou_thr=0.75,
    min_size=100, min_span=2, downsample_f=1, one_view=False,
    fine_boundaries=False, padding_factor=16, norms=None, progress=False,
):
    """scripts/pdl_inference3d.py:91-240 replayed in-process on a numpy
    volume with a torch model. Returns {class_id: consensus tracker}."""
    import torch

    ref = load_reference()
    patterns = ref["patterns"]
    filters = ref["filters"]

    labels = list(labels)
    thing_list = list(thing_list)
    shape = tuple(volume.shape)
    axes = {"xy": 0} if mode == "stack" else {"xy": 0, "xz": 1, "yz": 2}

    mean = norms["mean"] if norms else 0.0
    std = norms["std"] if norms else 1.0

    trackers = patterns.create_axis_trackers(axes, labels, label_divisor,
                                             shape)

    for axis_name, axis in axes.items():
        engine = ref["engine_cls"](
            tmodel, thing_list=thing_list,
            median_kernel_size=qlen,
            label_divisor=label_divisor,
            nms_threshold=nms_thr,
            nms_kernel=nms_kernel,
            confidence_thr=seg_thr,
            padding_factor=padding_factor,
            coarse_boundaries=not fine_boundaries,
        )
        matchers = patterns.create_matchers(thing_list, label_divisor,
                                            iou_thr, ioa_thr)

        n = shape[axis]
        rle_stack = []

        def put(pan_seg):
            """forward_matching body, inline (patterns.py:68-100)."""
            if pan_seg is None:
                return
            rle_seg = ref["pan_seg_to_rle_seg"](
                pan_seg, labels, label_divisor, thing_list,
                force_connected=True)
            rle_seg = patterns.apply_matchers(rle_seg, matchers)
            rle_stack.append(rle_seg)

        for i in range(n):
            sl = [slice(None)] * 3
            sl[axis] = i
            image = np.asarray(volume[tuple(sl)]).astype(np.float32)
            # A.Normalize(mean, std) on uint8 input: (x/255 - mean)/std
            if volume.dtype == np.uint8:
                image = image / 255.0
            image = (image - mean) / std
            h, w = image.shape
            tin = torch.from_numpy(image)[None, None]
            pan_seg = engine(tin, (h, w), upsampling=downsample_f)
            if pan_seg is not None:
                put(pan_seg.squeeze().cpu().numpy())
            if progress and (i + 1) % 16 == 0:
                print(f"  [{axis_name}] {i + 1}/{n}")

        for pan_seg in engine.end(downsample_f):
            put(pan_seg.squeeze().cpu().numpy())
        assert len(rle_stack) == n, (len(rle_stack), n)

        for index, rle_seg in patterns.backward_matching(
                rle_stack, matchers, n):
            patterns.update_trackers(rle_seg, index, trackers[axis_name])

        patterns.finish_tracking(trackers[axis_name])
        for tracker in trackers[axis_name]:
            filters.remove_small_objects(tracker, min_size=min_size)
            filters.remove_pancakes(tracker, min_span=min_span)

    consensus = {}
    for class_id in labels:
        class_trackers = patterns.get_axis_trackers_by_class(
            trackers, class_id)
        if mode == "orthoplane":
            if class_id in thing_list:
                tracker = patterns.create_instance_consensus(
                    class_trackers, pixel_vote_thr, cluster_iou_thr,
                    one_view)
                filters.remove_small_objects(tracker, min_size=min_size)
                filters.remove_pancakes(tracker, min_span=min_span)
            else:
                tracker = patterns.create_semantic_consensus(
                    class_trackers, pixel_vote_thr)
        else:
            tracker = class_trackers[0]
        consensus[class_id] = tracker

    return consensus


def fill_reference_consensus(consensus_tracker, shape):
    """Decode a reference tracker into a dense uint32 labelmap."""
    ref = load_reference()
    out = np.zeros(shape, np.uint32)
    ref["patterns"].fill_volume(out, consensus_tracker.instances)
    return out

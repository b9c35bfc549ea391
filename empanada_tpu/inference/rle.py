"""Panoptic segmentation <-> RLE instance dictionaries (host side).

Parity with reference inference/rle.py:26-150. The fast path consumes the
compact run buffers produced on device (ops/rle_device.extract_runs); the
dense path encodes a numpy pan_seg directly. Connected components +
regionprops are a single pass over runs (core.ccl), replacing
cc3d + skimage.regionprops.
"""

from __future__ import annotations

import numpy as np

from empanada_tpu.core.ccl import (
    image_to_runs,
    region_props_from_runs,
    runs_connected_components,
)
from empanada_tpu.core.rle import canonicalize_rle, string_to_rle

__all__ = [
    "pan_seg_to_rle_seg",
    "runs_to_rle_seg",
    "rle_seg_to_pan_seg",
    "unpack_packed_runs",
    "unpack_rle_attrs",
]


def unpack_packed_runs(row, pad_shape):
    """Decode one slice row of a fused-engine packed buffer.

    ``row`` is ``(1 + max_runs, 3)`` int32 with header
    ``(n_runs, oh, ow)``: the device extracts runs on the
    LANE-ALIGNED padded grid (non-128-multiple crops inside the block
    fn measured 2.4x slower end-to-end on TPU; the crop is unit-stride
    host math instead), so when ``(oh, ow) != pad_shape`` the run
    coordinates are raveled with the padded width and must be rebased
    here. Legacy ``(n, 0, 0)`` headers mean runs are already in
    ``pad_shape`` coordinates.

    Returns ``(starts, ends, values, (oh, ow))`` in true-crop raveled
    coordinates, or ``(None, None, None, (oh, ow))`` when the run
    budget overflowed (caller pulls the dense map and crops it).
    """
    n = int(row[0, 0])
    oh, ow = int(row[0, 1]), int(row[0, 2])
    if oh <= 0:
        oh, ow = int(pad_shape[0]), int(pad_shape[1])
    if n > row.shape[0] - 1:
        return None, None, None, (oh, ow)
    s = row[1:n + 1, 0]
    e = row[1:n + 1, 1]
    v = row[1:n + 1, 2]
    if (oh, ow) != (int(pad_shape[0]), int(pad_shape[1])):
        wpad = int(pad_shape[1])
        y, x = np.divmod(s, wpad)
        length = e - s
        s = y * ow + x
        e = s + length
    return s, e, v, (oh, ow)


def runs_to_rle_seg(starts, ends, values, shape, labels, label_divisor,
                    thing_list, force_connected=True):
    """Build {class: {instance_label: {box, starts, runs}}} from row-split
    runs of a panoptic map.

    Instance labeling matches the reference (rle.py:56-86): for thing
    classes with force_connected, connected components are relabeled
    1..n (offset by class*label_divisor); otherwise the panoptic values
    themselves are the instance labels.
    """
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    values = np.asarray(values, dtype=np.int64)
    keep = starts >= 0
    starts, ends, values = starts[keep], ends[keep], values[keep]

    h, w = shape
    rle_seg = {}
    for label in labels:
        min_id = label * label_divisor
        max_id = min_id + label_divisor

        sel = (values >= min_id) & (values < max_id) & (values > 0)
        s, e, v = starts[sel], ends[sel], values[sel]

        if len(s) == 0:
            rle_seg[label] = {}
            continue

        if force_connected and label in thing_list:
            comp, _ = runs_connected_components(s, e, v, w, connectivity=8)
            run_labels = comp.astype(np.int64) + min_id
        else:
            run_labels = v

        props = region_props_from_runs(s, e, run_labels, (h, w))
        rle_seg[label] = {
            lab: {"box": p["box"], "starts": p["starts"],
                  "runs": p["runs"],
                  # region props emit canonical RLEs with known areas:
                  # pre-seed the matcher's unpack memo (get_canon)
                  "_canon": (p["starts"], p["runs"], int(p["area"]),
                             p["starts"])}
            for lab, p in props.items()
        }
    return rle_seg


def pan_seg_to_rle_seg(pan_seg, labels, label_divisor, thing_list,
                       force_connected=True):
    """Dense (H, W) panoptic map -> RLE instance dict."""
    pan_seg = np.asarray(pan_seg)
    starts, ends, values = image_to_runs(pan_seg.astype(np.int32))
    return runs_to_rle_seg(starts, ends, values, pan_seg.shape, labels,
                           label_divisor, thing_list, force_connected)


def rle_seg_to_pan_seg(rle_seg, shape):
    """Inverse: RLE instance dict -> dense (H, W) panoptic map."""
    pan = np.zeros(int(np.prod(shape)), dtype=np.int64)
    for instance_attrs in rle_seg.values():
        for object_id, attrs in instance_attrs.items():
            for s, r in zip(attrs["starts"], attrs["runs"]):
                pan[s:s + r] = object_id
    return pan.reshape(shape)


def get_canon(attrs):
    """Return the valid ``_canon`` memo of an attrs dict, or None.

    The memo is a 4-tuple ``(canon_starts, canon_runs, area, src)``
    where ``src`` is the ``starts`` object the memo was computed from:
    a memo is valid only while ``attrs['starts']`` is still that object,
    so any code that REBINDS starts (e.g. Tiler.translate_rle_seg's
    frame shift) automatically invalidates it. Code must rebind, never
    mutate starts/runs arrays in place."""
    c = attrs.get("_canon")
    if c is not None and len(c) == 4 and c[3] is attrs.get("starts"):
        return c
    return None


def unpack_rle_attrs(instance_rle_seg, return_areas=False):
    """Dict of instances -> (labels, boxes, starts list, runs list
    [, areas float64]).

    Canonicalizes each RLE on the way in: JSONs written by the reference
    ecosystem (its tracker.finish() emits unsorted runs) must not
    silently break sorted-merge IoU math downstream. The canonical form
    (and area) is memoized ON the attrs dict under the private ``_canon``
    key (a deliberate side effect on caller-owned dicts; framework JSON
    writers serialize explicit keys so it never leaks to disk) — the
    stateful matcher re-unpacks the same target instances every slice,
    and at product density (100+ instances/slice) the repeated
    canonicality checks and area sums were a top-3 host cost. Validity
    is keyed on the identity of ``attrs['starts']`` (see get_canon)."""
    labels, boxes, starts, runs, areas = [], [], [], [], []
    for label, attrs in instance_rle_seg.items():
        labels.append(int(label))
        boxes.append(attrs["box"])
        cached = get_canon(attrs)
        if cached is None:
            if "rle" in attrs:
                s, r = string_to_rle(attrs["rle"])
            else:
                s, r = attrs["starts"], attrs["runs"]
            s, r = canonicalize_rle(s, r)
            cached = (s, r, int(np.sum(r)), attrs.get("starts"))
            attrs["_canon"] = cached
        starts.append(cached[0])
        runs.append(cached[1])
        areas.append(cached[2])
    out = (np.array(labels), np.array(boxes), starts, runs)
    if return_areas:
        out = out + (np.array(areas, dtype=np.float64),)
    return out

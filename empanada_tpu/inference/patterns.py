"""Reusable inference pipeline pieces (reference inference/patterns.py:15-350).

The reference overlaps postprocessing with GPU compute via a
multiprocessing.Queue worker process that receives dense pan_segs. Here the
dense->sparse frontier is on device (ops/rle_device.extract_runs), so the
host worker is a plain thread that receives *compact run buffers* still
resident on device: the main loop dispatches model forward + fused
postprocess + run extraction asynchronously, and the worker thread blocks
on the tiny D2H transfer, then does run-based CCL, RLE grouping, and
Hungarian matching while the next slice computes. If a slice overflows the
static run budget, the worker transparently falls back to pulling the dense
panoptic map.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from empanada_tpu.core.fill import chunked_fill_instances, numpy_fill_instances
from empanada_tpu.inference import filters as _filters_mod
from empanada_tpu.inference.consensus import (
    merge_objects_from_trackers,
    merge_semantic_from_trackers,
)
from empanada_tpu.inference.matcher import RLEMatcher
from empanada_tpu.inference.rle import (
    pan_seg_to_rle_seg,
    runs_to_rle_seg,
    unpack_packed_runs,
)
from empanada_tpu.inference.tracker import InstanceTracker

__all__ = [
    "create_matchers",
    "create_axis_trackers",
    "apply_matchers",
    "ForwardMatcher",
    "forward_matching",
    "backward_matching",
    "update_trackers",
    "finish_tracking",
    "apply_filters",
    "finish_axis",
    "build_consensus",
    "get_axis_trackers_by_class",
    "create_instance_consensus",
    "create_semantic_consensus",
    "fill_volume",
    "fill_panoptic_volume",
]


def create_matchers(thing_list, label_divisor, merge_iou_thr=0.25,
                    merge_ioa_thr=0.25):
    """One stateful RLEMatcher per thing class (reference patterns.py:33)."""
    return [
        RLEMatcher(thing_class, label_divisor, merge_iou_thr, merge_ioa_thr)
        for thing_class in thing_list
    ]


def create_axis_trackers(axes, class_labels, label_divisor, shape):
    """{'xy': axis, ...} -> {'xy': [tracker/class, ...], ...}
    (reference patterns.py:41)."""
    return {
        axis_name: [
            InstanceTracker(class_id, label_divisor, shape, axis_name)
            for class_id in class_labels
        ]
        for axis_name in axes
    }


def apply_matchers(rle_seg, matchers):
    """Forward-match each class's instances against the previous slice
    (reference patterns.py:55)."""
    for matcher in matchers:
        class_id = matcher.class_id
        if matcher.target_rle is None:
            matcher.initialize_target(rle_seg[class_id])
        else:
            rle_seg[class_id] = matcher(rle_seg[class_id])
    return rle_seg


class ForwardMatcher:
    """Threaded forward-matching pipeline stage.

    The TPU-native replacement for the reference's mp.Process +
    forward_matching loop (patterns.py:68-99): ``put`` accepts either a
    device panoptic map, a 5-tuple (pan, starts, ends, values, n_runs)
    pairing the map with device run buffers from
    ops/rle_device.extract_runs (preferred — only O(#runs) bytes cross
    PCIe, the map is the overflow fallback), or None (median queue still
    filling). ``put_block`` takes a whole fused-engine block.
    ``finish`` joins the worker and returns the rle_stack.
    """

    def __init__(self, matchers, labels, label_divisor, thing_list,
                 queue_size=8):
        self.matchers = matchers
        self.labels = list(labels)
        self.label_divisor = label_divisor
        self.thing_list = list(thing_list)
        self.rle_stack = []
        # slices whose device run buffer overflowed and fell back to a
        # dense pan-map pull (bench reports this: each costs a full-plane
        # D2H instead of O(#runs) bytes)
        self.overflow_count = 0
        self._ovf_lock = threading.Lock()
        self._queue = queue.Queue(maxsize=queue_size)
        self._exc = None
        # one decode worker: block D2H + run decode happens here while
        # the match thread does the (inherently serial) forward matching
        # of earlier slices — a 2-stage host pipeline
        self._decode_pool = ThreadPoolExecutor(max_workers=1)
        # per-class shard pool: forward matching is serial in slice
        # order PER CLASS but classes are independent, so multi-class
        # volumes match all classes of a slice concurrently (the native
        # matcher kernels release the GIL)
        self._class_pool = (ThreadPoolExecutor(max_workers=len(matchers))
                            if len(matchers) > 1 else None)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _to_rle_seg(self, item):
        if isinstance(item, tuple) and len(item) == 5:
            pan, starts, ends, values, n_runs = item
            n = int(n_runs)  # 4-byte D2H
            if n <= starts.shape[0]:
                shape = tuple(pan.shape[-2:])
                # transfer only the used prefix: D2H bandwidth is the
                # pipeline bottleneck on tunneled/remote devices
                return runs_to_rle_seg(
                    np.asarray(starts[:n]), np.asarray(ends[:n]),
                    np.asarray(values[:n]),
                    shape, self.labels, self.label_divisor, self.thing_list)
            item = pan  # run budget overflow: fall back to the dense map
            with self._ovf_lock:
                self.overflow_count += 1
        pan_seg = np.asarray(item).squeeze()
        return pan_seg_to_rle_seg(
            pan_seg, self.labels, self.label_divisor, self.thing_list)

    def _decode_block_to_segs(self, z_indices, pan_block, packed):
        """D2H + run decode for one block -> list of (unmatched) rle_segs.

        Pure per-slice work with no matcher state: runs on the decode
        executor so it overlaps the sequential matching of earlier
        slices (forward matching is inherently serial; decoding is not)."""
        arr = np.asarray(packed)  # ONE D2H for the whole block
        if arr.ndim == 1:  # flat transfer (fused.py flat_io)
            arr = arr.reshape(len(z_indices), -1, 3)
        pad_shape = tuple(pan_block.shape[-2:])
        segs = []
        for j, z in enumerate(z_indices):
            if z is None:
                continue
            starts, ends, values, (oh, ow) = unpack_packed_runs(
                arr[j], pad_shape)
            if starts is not None:
                rle_seg = runs_to_rle_seg(
                    starts, ends, values, (oh, ow), self.labels,
                    self.label_divisor, self.thing_list)
            else:  # run budget overflow: pull the dense map
                with self._ovf_lock:
                    self.overflow_count += 1
                rle_seg = pan_seg_to_rle_seg(
                    np.asarray(pan_block[j])[:oh, :ow], self.labels,
                    self.label_divisor, self.thing_list)
            segs.append(rle_seg)
        return segs

    def _run(self):
        while True:
            item = self._queue.get()
            if item is None:
                break
            try:
                if isinstance(item, tuple) and len(item) == 2 \
                        and item[0] == "decoded":
                    segs = item[1].result()  # decode-executor future
                    for rle_seg in segs:
                        rle_seg = self._match(rle_seg)
                        self.rle_stack.append(rle_seg)
                    continue
                rle_seg = self._to_rle_seg(item)
                rle_seg = self._match(rle_seg)
                self.rle_stack.append(rle_seg)
            except BaseException as e:  # surface in finish()/put()
                self._exc = e
                # drain so producers blocked on the bounded queue wake up
                while True:
                    try:
                        self._queue.get_nowait()
                    except queue.Empty:
                        break
                break

    @staticmethod
    def _match_one_class(matcher, rle_seg):
        """Advance one class's stateful matcher by one slice; writes only
        its own key of ``rle_seg`` (GIL-atomic dict assignment)."""
        class_id = matcher.class_id
        if matcher.target_rle is None:
            matcher.initialize_target(rle_seg[class_id])
        else:
            rle_seg[class_id] = matcher(rle_seg[class_id])

    def _match(self, rle_seg):
        if self._class_pool is None:
            return apply_matchers(rle_seg, self.matchers)
        futures = [self._class_pool.submit(self._match_one_class, m,
                                           rle_seg)
                   for m in self.matchers]
        for f in futures:
            f.result()  # propagate per-class exceptions
        return rle_seg

    def _check_worker(self):
        if self._exc is not None:
            raise self._exc

    def put(self, pan_seg):
        self._check_worker()
        if pan_seg is None:
            return
        self._queue.put(pan_seg)

    def put_block(self, z_indices, pan_block, packed):
        """Enqueue a whole fused-engine block: `packed` is the
        (B, 1+max_runs, 3) int32 run buffer; the decode worker moves it
        device->host with ONE transfer (per-op D2H latency dominates on
        tunneled devices) and decodes each slice's runs from it, while
        the match thread forward-matches previously decoded slices."""
        self._check_worker()
        fut = self._decode_pool.submit(
            self._decode_block_to_segs, z_indices, pan_block, packed)
        self._queue.put(("decoded", fut))

    def finish(self):
        self._queue.put(None)
        self._thread.join()
        self._decode_pool.shutdown(wait=True)
        if self._class_pool is not None:
            self._class_pool.shutdown(wait=True)
        if self._exc is not None:
            raise self._exc
        return self.rle_stack


def forward_matching(pan_segs, matchers, labels, label_divisor, thing_list):
    """Synchronous convenience wrapper over ForwardMatcher for an iterable
    of pan_segs; returns the rle_stack."""
    fm = ForwardMatcher(matchers, labels, label_divisor, thing_list)
    for pan_seg in pan_segs:
        fm.put(pan_seg)
    return fm.finish()


def backward_matching(rle_stack, matchers, axis_len):
    """Generator matching instances backward through the stack with
    assign_new=False (reference patterns.py:102-121). Yields
    (index, rle_seg)."""
    for matcher in matchers:
        matcher.target_rle = None
        matcher.assign_new = False

    for rev_idx in range(axis_len - 1, -1, -1):
        rle_seg = apply_matchers(rle_stack[rev_idx], matchers)
        yield rev_idx, rle_seg


def update_trackers(rle_seg, index, trackers):
    """Accumulate one matched slice into each class tracker
    (reference patterns.py:123)."""
    for tracker in trackers:
        tracker.update(rle_seg[tracker.class_id], index)


def finish_tracking(trackers):
    for tracker in trackers:
        tracker.finish()


def apply_filters(tracker, filters_dict):
    """Apply config-specified filters in place
    (reference patterns.py:141-152)."""
    if filters_dict is None:
        return
    for filt in filters_dict:
        kwargs = {k: v for k, v in filt.items() if k != "name"}
        getattr(_filters_mod, filt["name"])(tracker, **kwargs)


def finish_axis(rle_stack, matchers, axis_trackers, n, min_size, min_span):
    """Shared tail of one axis pass: backward matching over the forward-
    matched stack, tracking, finish, and the reference's size/span
    filters (pdl_inference3d.py:152-171). Used by both the single-process
    driver (cli/infer3d) and the multi-process rank-0 flow
    (parallel/multihost)."""
    for rev_idx, rle_seg in backward_matching(rle_stack, matchers, n):
        update_trackers(rle_seg, rev_idx, axis_trackers)
    finish_tracking(axis_trackers)
    for tracker in axis_trackers:
        apply_filters(tracker, [
            {"name": "remove_small_objects", "min_size": min_size},
            {"name": "remove_pancakes", "min_span": min_span},
        ])


def build_consensus(trackers, labels, thing_list, *, mode="orthoplane",
                    pixel_vote_thr=2, cluster_iou_thr=0.75, one_view=False,
                    min_size=500, min_span=4):
    """Per-class cross-axis consensus (reference pdl_inference3d.py:
    196-226): instance consensus (+ the reference's post-consensus
    re-filter) for thing classes, pixel-vote semantic consensus for
    stuff; stack mode passes the single axis through."""
    consensus = {}
    for class_id in labels:
        class_trackers = get_axis_trackers_by_class(trackers, class_id)
        if mode == "stack":
            consensus[class_id] = class_trackers[0]
            continue
        if class_id in thing_list:
            consensus[class_id] = create_instance_consensus(
                class_trackers, pixel_vote_thr, cluster_iou_thr,
                bypass=one_view)
            # voted intersections can fall below the size/span thresholds
            # even when every axis passed (pdl_inference3d.py:218-219)
            apply_filters(consensus[class_id], [
                {"name": "remove_small_objects", "min_size": min_size},
                {"name": "remove_pancakes", "min_span": min_span},
            ])
        else:
            consensus[class_id] = create_semantic_consensus(
                class_trackers, pixel_vote_thr)
    return consensus


def get_axis_trackers_by_class(trackers, class_id):
    return [
        tracker
        for axis_trackers in trackers.values()
        for tracker in axis_trackers
        if tracker.class_id == class_id
    ]


def create_instance_consensus(class_trackers, pixel_vote_thr=2,
                              cluster_iou_thr=0.75, bypass=False):
    """Cross-axis instance consensus -> new tracker
    (reference patterns.py:168-186)."""
    first = class_trackers[0]
    consensus_tracker = InstanceTracker(
        first.class_id, first.label_divisor, first.shape3d, "xy")
    consensus_tracker.instances = merge_objects_from_trackers(
        class_trackers, pixel_vote_thr, cluster_iou_thr, bypass)
    consensus_tracker.finished = True
    return consensus_tracker


def create_semantic_consensus(class_trackers, pixel_vote_thr=2):
    """Cross-axis semantic vote -> new tracker
    (reference patterns.py:188-202)."""
    first = class_trackers[0]
    consensus_tracker = InstanceTracker(
        first.class_id, first.label_divisor, first.shape3d, "xy")
    consensus_tracker.instances = merge_semantic_from_trackers(
        class_trackers, pixel_vote_thr)
    consensus_tracker.finished = True
    return consensus_tracker


def fill_volume(volume, instances, processes=4):
    """Fill a numpy array or chunked store with RLE instances, in place
    (reference patterns.py:204-213)."""
    if isinstance(volume, np.ndarray):
        numpy_fill_instances(volume, instances)
    else:
        chunked_fill_instances(volume, instances, processes=processes)


def fill_panoptic_volume(volume, trackers, processes=4):
    for tracker in trackers:
        fill_volume(volume, tracker.instances, processes)

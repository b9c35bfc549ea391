"""Multi-host (multi-process) 3D inference composition.

The reference's multi-GPU script shards slice inference over N ranks and
funnels pickled per-slice results to rank 0, which runs all matching,
tracking, and consensus (reference scripts/inference3d_multigpu.py:276-379
+ empanada/inference/patterns.py forward_multigpu). The TPU-native
composition keeps that topology but replaces the gloo side-channel with
``parallel.collectives`` (multihost_utils over the JAX distributed
runtime) and the per-rank model loop with the fused blocked engine:

- each process takes a CONTIGUOUS z-shard of every axis pass, extended by
  a median-window halo (``mid`` slices each side) so every emitted map is
  bit-identical to the single-process run;
- per-slice RLE decoding happens on the owning process (only O(#runs)
  bytes ever leave a device);
- rank 0 gathers the ordered shards, then runs the exact single-process
  matching -> backward-matching -> tracking -> consensus flow
  (cli/infer3d.run_inference3d semantics).

Bring-up: call ``parallel.initialize_distributed`` (or
``jax.distributed.initialize``) first; on CPU hosts it selects the gloo
collectives backend automatically.
"""

from __future__ import annotations

import numpy as np

__all__ = ["z_shard", "local_rle_shard", "multihost_run_inference3d"]


def z_shard(n, rank, world):
    """Contiguous near-even split of n slices: rank -> [start, end)."""
    per = -(-n // world)
    start = min(rank * per, n)
    return start, min(start + per, n)


def local_rle_shard(engine, vol_view, start, end, *, labels, label_divisor,
                    thing_list, upsampling=1, stats=None):
    """Run the fused engine over this process's extended z-shard and
    return [(global_z, unmatched rle_seg)] for global z in [start, end).

    The shard is extended by ``mid`` halo slices each side so the median
    window sees the same neighbors as the single-process pass; local raw
    /median emission decisions then coincide with the global ones for
    every kept slice (engines.py:68-90 semantics).

    ``stats`` (optional dict) receives this rank's device-op accounting:
    ``dispatches`` (blocks launched) and ``d2h_bytes`` (packed run
    buffers + dense overflow pulls) — both must scale ~1/world for the
    composition to scale (tests/test_parallel.py pins this).
    """
    from empanada_tpu.inference.rle import (
        pan_seg_to_rle_seg,
        runs_to_rle_seg,
        unpack_packed_runs,
    )

    n = len(vol_view)
    mid = engine.mid
    lo = max(0, start - mid)
    hi = min(n, end + mid)
    ext = vol_view[lo:hi]

    dispatches = 0
    d2h_bytes = 0
    out = []
    for z_indices, pan_block, packed in engine.infer_blocks_resident(
            ext, upsampling=upsampling):
        arr = np.asarray(packed).reshape(len(z_indices), -1, 3)
        dispatches += 1
        d2h_bytes += arr.nbytes
        pad_shape = tuple(pan_block.shape[-2:])
        pan_host = None
        for j, zl in enumerate(z_indices):
            if zl is None:
                continue
            z = lo + zl
            if not (start <= z < end):
                continue  # halo emission owned by a neighbor rank
            starts, ends, values, (oh, ow) = unpack_packed_runs(
                arr[j], pad_shape)
            if starts is not None:
                rle_seg = runs_to_rle_seg(
                    starts, ends, values, (oh, ow), labels, label_divisor,
                    thing_list)
            else:  # run budget overflow: pull the dense map
                if pan_host is None:
                    pan_host = np.asarray(pan_block)
                    d2h_bytes += pan_host.nbytes
                rle_seg = pan_seg_to_rle_seg(pan_host[j][:oh, :ow], labels,
                                             label_divisor, thing_list)
            out.append((z, rle_seg))
    if stats is not None:
        stats["dispatches"] = dispatches
        stats["d2h_bytes"] = d2h_bytes
    return out


def multihost_run_inference3d(
        model, volume, *, labels, thing_list, class_names=None,
        mode="orthoplane", qlen=3, label_divisor=20000, seg_thr=0.3,
        nms_thr=0.1, nms_kernel=3, iou_thr=0.25, ioa_thr=0.25,
        pixel_vote_thr=2, cluster_iou_thr=0.75, min_size=500, min_span=4,
        one_view=False, fine_boundaries=False, padding_factor=128,
        max_centers=256, block_size=8, norms=None, progress=False):
    """Z-sharded multi-process ``run_inference3d``: every process calls
    this with the same (replicated) model + volume; rank 0 returns
    {class_id: consensus InstanceTracker}, other ranks return None.

    Single-process (jax.process_count()==1) degrades to exactly the
    local flow — usable as a drop-in in launcher scripts, like the
    reference's script works at world_size 1.
    """
    import jax

    from empanada_tpu.inference import patterns
    from empanada_tpu.inference.fused import FusedStackEngine
    from empanada_tpu.parallel.collectives import all_gather_objects

    if isinstance(model, tuple):
        module, variables = model
    else:  # JittedModel
        module, variables = model.module, model.params
    rank = jax.process_index()
    world = jax.process_count()

    volume = np.asarray(volume)
    shape = tuple(volume.shape)
    axes = {"xy": 0} if mode == "stack" else {"xy": 0, "xz": 1, "yz": 2}
    trackers = patterns.create_axis_trackers(axes, labels, label_divisor,
                                             shape)

    for axis_name, axis in axes.items():
        engine = FusedStackEngine(
            module, variables, thing_list, block_size=block_size,
            label_divisor=label_divisor, median_kernel_size=qlen,
            nms_threshold=nms_thr, nms_kernel=nms_kernel,
            confidence_thr=seg_thr, padding_factor=padding_factor,
            coarse_boundaries=not fine_boundaries,
            max_centers=max_centers, stuff_area=0, device_norms=norms)
        view = volume if axis == 0 else np.moveaxis(volume, axis, 0)
        if norms is None:
            view = np.ascontiguousarray(view, np.float32)
        n = len(view)
        start, end = z_shard(n, rank, world)
        local = local_rle_shard(
            engine, view, start, end, labels=labels,
            label_divisor=label_divisor, thing_list=thing_list)
        gathered = all_gather_objects(local)
        if rank != 0:
            continue

        by_z = {z: seg for part in gathered for z, seg in part}
        assert sorted(by_z) == list(range(n)), "shard coverage hole"

        # rank 0 runs the single-process matching flow over the ordered
        # stack (reference rank-0 matching, inference3d_multigpu.py:318);
        # the tail is the EXACT shared helper cli/infer3d uses
        matchers = patterns.create_matchers(thing_list, label_divisor,
                                            iou_thr, ioa_thr)
        rle_stack = []
        for z in range(n):
            rle_stack.append(patterns.apply_matchers(by_z[z], matchers))
        patterns.finish_axis(rle_stack, matchers, trackers[axis_name], n,
                             min_size, min_span)
        if progress:
            print(f"[{axis_name}] {n} slices over {world} processes")

    if rank != 0:
        return None

    return patterns.build_consensus(
        trackers, labels, thing_list, mode=mode,
        pixel_vote_thr=pixel_vote_thr, cluster_iou_thr=cluster_iou_thr,
        one_view=one_view, min_size=min_size, min_span=min_span)

"""Fully-fused blocked stack inference: ONE device dispatch per B slices.

The production fast path. The per-slice engine (engines.py) issues several
device calls per slice (forward, median, cells, merge, extract); on real
TPU deployments dispatch latency dominates at small slice cost, and the
MXU is underutilized at batch 1. This engine restructures the whole
per-slice pipeline (reference engines.py:327-394 semantics) as a single
jitted block function over B slices:

- model forward batched (B, H, W, 1) — MXU-efficient;
- the z-median window crosses block boundaries via carried device state
  (last ks-1 sem maps + last mid ctr/offset maps), donated each call;
- emission semantics match the reference median queue exactly: slice z
  emits the window median for mid <= z < n-mid and its raw (un-smoothed)
  map at the stack edges (engines.py:68-90);
- center NMS + pixel grouping + panoptic merge + run extraction are
  vmapped over the block, so only (B, max_runs) int32 buffers leave the
  device.

Transfer discipline (measured, docs/performance.md): host<->device moves
through this deployment's tunnel are the wall, so

- images upload in their NATIVE dtype (uint8 EM volumes stay uint8 — 4x
  fewer bytes) and are normalized ON DEVICE when ``device_norms`` is set,
  with the exact Normalize formula ((x/255 - mean)/std, transforms.py:334)
  and the factor-pad ring re-zeroed to match pad-after-normalize;
- buffers cross flat (1D) and are reshaped on device/host — tiny trailing
  dims ((B,H,W,1), (B,R,3)) can hit tiled-layout padding blowup;
- up to ``pipeline_depth`` blocks stay in flight: dispatch k+1..k+depth
  before block k's packed transfer is consumed, with
  ``copy_to_host_async`` started at dispatch time.

Host code drives blocks and hands (pan, runs) to the matcher thread.
"""

from __future__ import annotations

import math
import os
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from empanada_tpu.inference.engines import logits_to_prob
from empanada_tpu.ops.postprocess import (
    find_instance_centers,
    group_pixels,
    harden_semantic,
    median_small,
    merge_semantic_and_instance,
    merge_semantic_and_instance_coarse,
)
from empanada_tpu.ops.rle_device import extract_fg_runs
from empanada_tpu.ops.resize import factor_pad

__all__ = ["FusedStackEngine"]

# Jitted block functions shared ACROSS engine instances. jax.jit keys its
# executable cache on the Python function object, and every engine builds
# fresh closures — so a second run_inference3d call in the same process
# (or the 3 per-axis engines of older code) would re-trace and re-lower
# every per-shape graph even though the XLA binary is already in the
# persistent cache (measured ~15-22 s of a 36 s orthoplane pass,
# /tmp cProfile 2026-08-17). Keyed on every value the trace closes over:
# module (flax modules hash by config), shapes, norm constants, and all
# postprocess parameters. Variables are call arguments, never part of the
# key. Bounded LRU: each entry retains a compiled executable (and the
# engine objects its closure captured), so a long-lived process sweeping
# configs (bench/A-B tools) would otherwise grow without bound.
import collections


class _LRU(collections.OrderedDict):
    def __init__(self, cap):
        super().__init__()
        self.cap = cap

    def get(self, key, default=None):
        if key in self:
            self.move_to_end(key)
            return self[key]
        return default

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self.move_to_end(key)
        while len(self) > self.cap:
            self.popitem(last=False)


_BLOCK_FN_CACHE = _LRU(64)

# Device-pinned variables shared across engine instances: re-uploading a
# MitoNet-class param tree through the tunnel costs ~1.7-2.3 s per
# engine construction (cProfile 2026-08-17). Keyed by host-tree identity
# + placement; the value keeps the HOST tree alive so its id cannot be
# recycled. Bounded LRU: each pinned tree is ~30M params of HBM, so the
# cache holds the few most recent (evicted device copies free once the
# last engine referencing them drops).
_PINNED_VARS_CACHE = _LRU(4)


def _pinned_variables(variables, placement):
    # Device and NamedSharding both hash by content
    key = (id(variables), placement)
    hit = _PINNED_VARS_CACHE.get(key)
    if hit is not None and hit[0] is variables:
        return hit[1]
    pinned = jax.device_put(variables, placement)
    jax.block_until_ready(pinned)
    _PINNED_VARS_CACHE[key] = (variables, pinned)
    return pinned


class _PackedGroup:
    """k flat packed buffers stacked on device -> ONE D2H transfer,
    materialized lazily on first consumer access (D2H per-op latency is
    the pipeline tail; grouping divides the op count by k)."""

    def __init__(self, stacked):
        self.dev = stacked
        self.host = None

    def row(self, i):
        if self.host is None:
            self.host = np.asarray(self.dev)
            self.dev = None
        return self.host[i]


class _PackedView:
    """One block's flat packed buffer inside a _PackedGroup; quacks like
    an array for np.asarray (ForwardMatcher's only requirement)."""

    def __init__(self, group, i):
        self._group = group
        self._i = i

    def __array__(self, dtype=None, copy=None):
        row = self._group.row(self._i)
        if dtype is not None and row.dtype != dtype:
            row = row.astype(dtype)
        return row

    def block_until_ready(self):
        self._group.row(self._i)
        return self


class _BlockView:
    """One block's (B, oh, ow) pan maps inside a device-stacked
    (k, B, oh, ow) scan output. Consumers only touch pan on run-budget
    overflow, so slicing stays lazy on device."""

    def __init__(self, arr, i):
        self._arr = arr
        self._i = i

    @property
    def shape(self):
        return self._arr.shape[1:]

    def __len__(self):
        return self._arr.shape[1]

    def __getitem__(self, j):
        return self._arr[self._i, j]

    def __array__(self, dtype=None, copy=None):
        out = np.asarray(self._arr[self._i])
        if dtype is not None and out.dtype != dtype:
            out = out.astype(dtype)
        return out


class FusedStackEngine:
    """Blocked, fused 3D stack inference engine.

    ``infer_blocks(dataset)`` yields (z_indices, pan_block, packed) per
    block — packed is the single int32 run buffer the ForwardMatcher
    consumes with ONE device-to-host transfer per block. pan_block and
    the run coordinates stay on the LANE-ALIGNED padded grid (device
    crops to non-128-multiple shapes measured 2.4x slower); the packed
    header (n_runs, oh, ow) carries the true crop for the host-side
    rebase (rle.unpack_packed_runs).
    ``infer_stack(dataset)`` is the per-slice generator view (already
    rebased/cropped).

    ``device_norms=(mean, std)``: normalize on device; feed the engine
    RAW (un-normalized) slices — uint8 volumes upload 4x smaller.
    ``pipeline_depth``: blocks kept in flight past the consumer (>=1
    overlaps the consumer's D2H + host matching with device compute and
    the next uploads; 0 reproduces strict lockstep).
    ``d2h_group``: STREAMING path only — stack this many blocks' packed
    run buffers on device and pull them in ONE transfer (D2H latency is
    per-OPERATION on remote/tunneled runtimes; grouping divides the op
    count). Pure data movement — emitted results are identical.
    Single-device paths only.
    ``scan_blocks``: RESIDENT path only — lax.scan this many blocks
    inside ONE dispatch (carries thread through the scan; outputs come
    back stacked), dividing dispatch round trips AND D2H ops by k; it
    supersedes d2h_group there (the scan output is already one buffer).
    """

    def __init__(self, module, variables, thing_list, block_size=None,
                 label_divisor=1000, stuff_area=64, void_label=0,
                 nms_threshold=0.1, nms_kernel=7, confidence_thr=0.5,
                 median_kernel_size=3, padding_factor=128,
                 coarse_boundaries=True, max_centers=256,
                 num_classes=None, max_runs=None, mesh=None,
                 device_norms=None, pipeline_depth=2, d2h_group=1,
                 scan_blocks=1):
        assert median_kernel_size % 2 == 1
        self.module = module
        self.thing_list = list(thing_list)
        # None = AUTO: resolved per slice shape at infer time
        # (_resolve_block) — 8 512^2-slices worth of pixels per device
        # per dispatch, so smaller orthoplane slices earn proportionally
        # bigger blocks instead of paying the constant tunnel/PCIe
        # dispatch latency 4x as often (round-2 VERDICT missing #5;
        # reference intent: inference3d_multigpu.py slice sharding)
        self.block_size = block_size
        if block_size is not None and mesh is not None:
            assert block_size % mesh.size == 0, (
                f"block_size {block_size} must divide over the "
                f"{mesh.size}-device mesh")
        self.label_divisor = label_divisor
        self.stuff_area = stuff_area
        self.void_label = void_label
        self.nms_threshold = nms_threshold
        self.nms_kernel = nms_kernel
        self.confidence_thr = confidence_thr
        self.ks = median_kernel_size
        self.mid = (median_kernel_size - 1) // 2
        self.padding_factor = padding_factor
        self.coarse_boundaries = coarse_boundaries
        self.max_centers = max_centers
        self.max_runs = max_runs
        self.device_norms = device_norms
        self.pipeline_depth = int(pipeline_depth)
        self.d2h_group = max(int(d2h_group), 1) if mesh is None else 1
        self.scan_blocks = max(int(scan_blocks), 1)
        self.last_dispatch_count = 0  # jit calls in the last infer pass
        self._num_classes = num_classes
        self._block_fns = {}  # keyed by (render_steps, upsampling, crop, ...)
        self._abstract_by_fn = {}  # jitted fn -> ShapeDtypeStructs

        self._mesh = mesh
        if mesh is not None:
            from empanada_tpu.parallel.mesh import (
                batch_sharding, replicated_sharding)

            self.variables = _pinned_variables(
                variables, replicated_sharding(mesh))
            self._image_sharding = batch_sharding(mesh)
        else:
            # pin params to the compute device ONCE: host-committed
            # variables would re-transfer every leaf on every block call
            # (~700 H2D ops per block)
            self.variables = _pinned_variables(variables, jax.devices()[0])
            self._image_sharding = None

    # -----------------------------------------------------------------

    def _resolve_block(self, pad_shape, n):
        """Slices per dispatch for this slice shape: the explicit
        setting if given, else scaled to keep ~8 512^2-slices of pixels
        per device per dispatch (dispatch round-trip latency is constant,
        so smaller slices earn bigger blocks), capped at 64 per device
        and clamped to the stack length."""
        mf = self._mesh.size if self._mesh is not None else 1
        if self.block_size is not None:
            return self.block_size
        ph, pw = pad_shape
        # round the pixel-budget scale to the nearest block quantum
        # instead of flooring: a 384^2 padded slice is 1.78x smaller
        # than 512^2 but floored to scale 1, leaving B=8 and twice the
        # dispatch count (dispatch+D2H round-trips are latency-bound on
        # tunneled devices, ~110-160 ms/op)
        B = 8 * (512 * 512) * mf / max(ph * pw, 1)
        B = max(8 * mf, min(64 * mf, round(B / (8 * mf)) * 8 * mf))
        need = n + self.mid
        if B > need:
            # clamp to the stack, rounded to a multiple of 8 (bounds
            # the number of distinct compiled block shapes) and of the
            # mesh size
            B = min(B, -(-(-(-need // 8) * 8) // mf) * mf)
        return B

    def _auto_max_runs(self, H, W):
        """Packed-run budget for a padded slice of H x W (sem res).

        Product-density EM instances measure ~50 foreground runs each
        (one per row spanned; tools/probe_matcher.py: 9074 runs at 168
        inst on 512^2), so the per-instance coefficient must grow with
        slice extent: ``H // 21`` is exactly 24 at H = 512 — every
        compiled graph at <= 512^2 keeps its shapes — and 48 at
        H = 1024, where the flat 24 * max_centers budget (12288 at
        max_centers 512) sat below the ~19k runs/slice of a 1k^3
        product volume and forced the dense-map D2H fallback on every
        slice.

        The instance-count term alone still under-budgets when the
        model fills a large fraction of the slice: a 512^3 product
        volume at ~215 predicted inst/slice measures ~15.4k device
        runs/slice (2026-08-18 chip probe) against the 12288 budget,
        putting EVERY slice on the dense-pull fallback (0.7 slices/s).
        Foreground runs are bounded by fg_area / mean_run_length, so an
        area term H*W/16 (6.25% of pixels; measured peak is ~5.9%)
        keeps dense product content packed while costing only
        3*4*H*W/16 = 0.75 bytes/pixel of D2H — 5x under the dense
        uint32 plane the fallback would pull."""
        return max(4096, 8 * H, max(24, H // 21) * self.max_centers,
                   (H * W) // 16)

    def _trace_key(self, kind, num_classes, render_steps, upsampling,
                   max_runs, crop, pad_shape, B, extra=()):
        """Everything the block-function trace closes over, for the
        process-wide _BLOCK_FN_CACHE."""
        norms = self.device_norms
        if norms is not None:
            mean = float(
                norms["mean"] if isinstance(norms, dict) else norms[0])
            std = float(
                norms["std"] if isinstance(norms, dict) else norms[1])
            norm_key = (mean, std)
        else:
            norm_key = None
        # env-gated trace-time variants (s2d stem, approx top-k, Pallas
        # grouping) change the traced graph without changing any module
        # config — they MUST key the cache or an in-process A/B silently
        # reuses the other variant's compiled fn
        env_key = tuple(
            os.environ.get(v, "") for v in
            ("EMPANADA_S2D_STEM", "EMPANADA_APPROX_TOPK",
             "EMPANADA_PALLAS_GROUP"))
        key = (kind, self.module, num_classes, render_steps, upsampling,
               max_runs, tuple(crop), tuple(pad_shape), B, self.ks,
               norm_key, tuple(self.thing_list), self.label_divisor,
               self.stuff_area, self.void_label, self.nms_threshold,
               self.nms_kernel, self.confidence_thr, self.max_centers,
               self.coarse_boundaries, self._mesh, env_key, tuple(extra))
        try:
            hash(key)
        except TypeError:
            # module configs with unhashable fields fall back to object
            # identity (still correct: the cached fn's closure keeps the
            # module alive, so its id cannot be recycled)
            key = (kind, id(self.module)) + key[2:-3] + (id(self._mesh),
                                                         env_key,
                                                         tuple(extra))
        return key

    def _norm_params(self, crop, pad_shape, upsampling):
        """Device-normalization constants: (mean, std, pad_mask) — the
        exact host Normalize formula ((x/255 - mean)/std, transforms.py
        :334) with the factor-pad ring re-zeroed to match
        pad-after-normalize."""
        norms = self.device_norms
        oh, ow = crop
        ph, pw = pad_shape
        mean = float(norms["mean"] if isinstance(norms, dict) else norms[0])
        std = float(norms["std"] if isinstance(norms, dict) else norms[1])
        ny = -(-oh // upsampling)
        nx = -(-ow // upsampling)
        if ny < ph or nx < pw:
            ring = np.zeros((ph, pw, 1), np.float32)
            ring[:min(ny, ph), :min(nx, pw)] = 1.0
            pad_mask = jnp.asarray(ring)
        else:
            pad_mask = None
        return mean, std, pad_mask

    def _make_postprocess(self, num_classes, upsampling, max_runs, crop):
        """The per-slice device postprocess closure shared by the
        streaming and volume-resident block functions."""
        step = 4 if self.coarse_boundaries else 1
        scale = step * upsampling
        oh, ow = crop
        table = np.zeros((num_classes,), bool)
        for t in self.thing_list:
            table[t] = True
        thing_table = jnp.asarray(table)

        def postprocess_one(sem_prob, ctr, off):
            centers, valid = find_instance_centers(
                ctr, self.nms_threshold, self.nms_kernel, self.max_centers)
            ins_coarse = group_pixels(centers, valid, off, step=float(step))
            ins_coarse = jnp.where(jnp.any(valid), ins_coarse, 0)
            sem = harden_semantic(sem_prob, self.confidence_thr)
            if scale > 1:
                # block-constant cells: vote on the coarse grid
                pan = merge_semantic_and_instance_coarse(
                    sem, ins_coarse, scale, self.label_divisor,
                    thing_table, self.stuff_area, self.void_label,
                    self.max_centers, num_classes)
            else:
                pan = merge_semantic_and_instance(
                    sem, ins_coarse, self.label_divisor, thing_table,
                    self.stuff_area, self.void_label, self.max_centers,
                    num_classes)
            # STAY on the lane-aligned padded grid: cropping pan to a
            # non-128-multiple minor dim inside the block fn measured
            # 2.4x slower per slice end-to-end (320^2 crop of a 384^2
            # pad: 21.6 vs 8.9 ms/slice, 448^2 crop of 512^2: 35.9 vs
            # 15.4 — 2026-08-19 chip A/B). Zero the pad margin so it
            # contributes no runs; the header carries the true crop and
            # the host rebases run coordinates with unit-stride math
            # (rle.unpack_packed_runs).
            if pan.shape != (oh, ow):
                in_crop = (
                    (jnp.arange(pan.shape[0], dtype=jnp.int32)[:, None]
                     < oh)
                    & (jnp.arange(pan.shape[1], dtype=jnp.int32)[None, :]
                       < ow))
                pan = jnp.where(in_crop, pan, 0)
            starts, ends, values, n_runs = extract_fg_runs(pan, max_runs)
            # pack runs + count into ONE int32 buffer: D2H on this
            # environment costs ~100ms *per operation* regardless of
            # size, so the whole block must cross in a single transfer
            header = jnp.stack(
                [n_runs, jnp.int32(oh), jnp.int32(ow)])[None]
            packed = jnp.concatenate(
                [header, jnp.stack([starts, ends, values], axis=-1)],
                axis=0)  # (1 + max_runs, 3)
            return pan, packed

        return postprocess_one

    def _build(self, num_classes, render_steps, upsampling, max_runs,
               crop, pad_shape, B):
        cache_key = self._trace_key(
            "stream", num_classes, render_steps, upsampling, max_runs,
            crop, pad_shape, B)
        hit = _BLOCK_FN_CACHE.get(cache_key)
        if hit is not None:
            return hit
        module = self.module
        ks, mid = self.ks, self.mid
        oh, ow = crop  # original slice shape; run extraction must use it
        # (reference crops before any host work, engines.py:392)
        ph, pw = pad_shape  # factor-padded input shape

        norms = self.device_norms
        if norms is not None:
            mean, std, pad_mask = self._norm_params(crop, pad_shape,
                                                    upsampling)

        # flat transfers only on the single-device path: resharding a
        # flattened batch axis is not worth it on real meshes
        flat_io = self._mesh is None

        postprocess_one = self._make_postprocess(num_classes, upsampling,
                                                 max_runs, crop)

        def block_fn(variables, carry_sem, carry_ctr, carry_off,
                     images, use_median):
            if flat_io:
                images = images.reshape(B, ph, pw, 1)
            x = images.astype(jnp.float32)
            if norms is not None:
                x = (x / 255.0 - mean) / std
                if pad_mask is not None:
                    x = x * pad_mask
            out = module.apply(
                variables, x, train=False, render_steps=render_steps,
                interpolate_ins=not self.coarse_boundaries)
            sem = logits_to_prob(out["sem_logits"])      # (B, H, W, C)
            ctr = out["ctr_hmp"]                          # (B, h4, w4, 1)
            off = out["offsets"]                          # (B, h4, w4, 2)

            allsem = jnp.concatenate([carry_sem, sem], axis=0)
            allctr = jnp.concatenate([carry_ctr, ctr], axis=0)
            alloff = jnp.concatenate([carry_off, off], axis=0)

            # window j = allsem[j : j+ks]; emitted slice z sits at j+mid
            win = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(allsem, j, ks, 0)
                 for j in range(B)], axis=0)              # (B, ks, H, W, C)
            med = median_small(win, axis=1)
            raw = jax.lax.dynamic_slice_in_dim(allsem, mid, B, 0)
            emit_sem = jnp.where(use_median[:, None, None, None], med, raw)
            emit_ctr = allctr[:B, ..., 0]
            emit_off = alloff[:B]

            pan, packed = jax.vmap(postprocess_one)(
                emit_sem, emit_ctr, emit_off)

            new_carry_sem = allsem[-(ks - 1):] if ks > 1 \
                else allsem[:0]
            new_carry_ctr = allctr[-mid:] if mid > 0 else allctr[:0]
            new_carry_off = alloff[-mid:] if mid > 0 else alloff[:0]
            if flat_io:
                packed = packed.reshape(-1)
            return (new_carry_sem, new_carry_ctr, new_carry_off,
                    pan, packed)

        if self._mesh is not None:
            # explicit shardings: carries/params replicated, the slice
            # batch sharded — avoids SPMD's involuntary rematerialization
            # on the carry concat (carry length ks-1 doesn't divide the
            # mesh)
            from empanada_tpu.parallel.mesh import (
                batch_sharding, replicated_sharding)

            rep = replicated_sharding(self._mesh)
            bsh = batch_sharding(self._mesh)
            fn = jax.jit(
                block_fn, donate_argnums=(1, 2, 3),
                in_shardings=(rep, rep, rep, rep, bsh, rep),
                out_shardings=(rep, rep, rep, bsh, bsh))
        else:
            fn = jax.jit(block_fn, donate_argnums=(1, 2, 3))
        _BLOCK_FN_CACHE[cache_key] = fn
        return fn

    # -----------------------------------------------------------------

    def _build_resident(self, num_classes, render_steps, upsampling,
                        max_runs, crop, pad_shape, n, B, scan_k):
        """Scan function over a DEVICE-RESIDENT volume chunk: instead of
        uploading (B, H, W) images per block, the (chunk, ph, pw) volume
        lives in HBM (uint8 = 4 bytes/px less than fp32) and each block
        dynamic-slices its window on device.

        ``lax.scan`` runs ``scan_k`` consecutive blocks per dispatch —
        median carries thread through the scan, outputs come back stacked
        ((k, B, oh, ow) pan + (k, L) packed), so the host pays ONE
        dispatch round trip and ONE D2H per k blocks. ``use_median`` and
        the block start are computed on device from a DONATED z0 carry —
        per-block host scalar commits are synchronous ~22 ms each on
        tunneled runtimes (tools/probe_resident.py) and would serialize
        the loop. Requires ``device_norms`` (or a float32 volume)."""
        cache_key = self._trace_key(
            "resident", num_classes, render_steps, upsampling, max_runs,
            crop, pad_shape, B, extra=(n, scan_k))
        hit = _BLOCK_FN_CACHE.get(cache_key)
        if hit is not None:
            return hit
        module = self.module
        ks, mid = self.ks, self.mid

        norms = self.device_norms
        if norms is not None:
            mean, std, pad_mask = self._norm_params(crop, pad_shape,
                                                    upsampling)

        postprocess_one = self._make_postprocess(num_classes, upsampling,
                                                 max_runs, crop)

        def step(variables, chunk, chunk_base, carry):
            carry_sem, carry_ctr, carry_off, z0_global = carry
            # callers guarantee z0 - chunk_base + B <= n_chunk, so
            # dynamic_slice never clamps
            z0_local = z0_global - chunk_base
            images = jax.lax.dynamic_slice_in_dim(chunk, z0_local, B, 0)
            x = images[..., None].astype(jnp.float32)
            if norms is not None:
                x = (x / 255.0 - mean) / std
                if pad_mask is not None:
                    x = x * pad_mask
            out = module.apply(
                variables, x, train=False, render_steps=render_steps,
                interpolate_ins=not self.coarse_boundaries)
            sem = logits_to_prob(out["sem_logits"])
            ctr = out["ctr_hmp"]
            off = out["offsets"]

            allsem = jnp.concatenate([carry_sem, sem], axis=0)
            allctr = jnp.concatenate([carry_ctr, ctr], axis=0)
            alloff = jnp.concatenate([carry_off, off], axis=0)

            win = jnp.stack(
                [jax.lax.dynamic_slice_in_dim(allsem, j, ks, 0)
                 for j in range(B)], axis=0)
            med = median_small(win, axis=1)
            raw = jax.lax.dynamic_slice_in_dim(allsem, mid, B, 0)
            # emitted slice z = z0_global + j - mid uses the median for
            # mid <= z < n - mid, its raw map at the stack edges
            # (reference engines.py:68-90)
            z = z0_global + jnp.arange(B) - mid
            use_median = (z >= mid) & (z < n - mid)
            emit_sem = jnp.where(use_median[:, None, None, None], med, raw)
            emit_ctr = allctr[:B, ..., 0]
            emit_off = alloff[:B]

            pan, packed = jax.vmap(postprocess_one)(
                emit_sem, emit_ctr, emit_off)

            new_carry_sem = allsem[-(ks - 1):] if ks > 1 else allsem[:0]
            new_carry_ctr = allctr[-mid:] if mid > 0 else allctr[:0]
            new_carry_off = alloff[-mid:] if mid > 0 else alloff[:0]
            return ((new_carry_sem, new_carry_ctr, new_carry_off,
                     z0_global + B), (pan, packed.reshape(-1)))

        def scan_fn(variables, carry_sem, carry_ctr, carry_off, z0,
                    chunk, chunk_base):
            carry = (carry_sem, carry_ctr, carry_off, z0)
            carry, (pan, packed) = jax.lax.scan(
                lambda c, _: step(variables, chunk, chunk_base, c),
                carry, None, length=scan_k)
            cs, cc, co, z0 = carry
            return cs, cc, co, z0, pan, packed  # (k, B, ph, pw), (k, L)

        fn = jax.jit(scan_fn, donate_argnums=(1, 2, 3, 4))
        _BLOCK_FN_CACHE[cache_key] = fn
        return fn

    def infer_blocks_resident(self, volume, upsampling=1,
                              chunk_slices=None):
        """``infer_blocks`` over a host ndarray volume with the volume
        resident in HBM: upload once (or in ``chunk_slices`` z-chunks,
        double-buffered), zero per-block image H2D. Single-device path;
        same yield contract as ``infer_blocks``. The caller orients the
        axis (pass ``volume.transpose(...)`` for xz/yz orthoplane passes)
        and leaves dtype native (uint8 + ``device_norms`` is the
        production EM layout)."""
        assert self._mesh is None, "resident path is single-device"
        # the resident path takes the RAW full-res volume; the
        # downsample-then-render flow needs per-slice host downscaling
        # (VolumeDataset(scale=)) — use the streaming path for it
        # (cli/infer3d gates on downsample_f == 1 accordingly)
        assert upsampling == 1, \
            "downsampled passes use infer_blocks(dataset, upsampling=)"
        if self.device_norms is None:
            volume = np.asarray(volume, np.float32)
        render_steps = int(2 + math.log2(upsampling))
        ks, mid = self.ks, self.mid
        n, oh, ow = volume.shape
        ph = (-oh) % self.padding_factor + oh
        pw = (-ow) % self.padding_factor + ow
        B = self._resolve_block((ph, pw), n)
        H, W = ph * upsampling, pw * upsampling
        if self._num_classes is None:
            self._num_classes = max(
                int(getattr(self.module, "num_classes", 1)),
                (max(self.thing_list) + 1) if self.thing_list else 1, 2)
        # auto run budget scales with the instance budget: at the
        # product's hundreds of instances/slice (label_divisor 20000,
        # reference pdl_inference3d.py:28-31) each instance contributes
        # ~one run per row it spans, so 8*H alone systematically
        # overflows and every slice falls back to a dense-map pull
        max_runs = self.max_runs or self._auto_max_runs(H, W)

        block_starts = list(range(0, n + mid, B))
        n_padded = block_starts[-1] + B

        fn_key = ("resident", render_steps, upsampling, (oh, ow), max_runs,
                  (ph, pw), volume.dtype.str, n, B)
        if not hasattr(self, "_resident_args"):
            self._resident_args = {}
        self._resident_args[fn_key] = (
            self._num_classes, render_steps, upsampling, max_runs,
            (oh, ow), (ph, pw), n, B)

        n_sem_ch = getattr(self.module, "num_classes", 1)
        h4 = ph // 4 if self.coarse_boundaries else ph
        w4 = pw // 4 if self.coarse_boundaries else pw
        carry_sem = jnp.zeros((ks - 1, H, W, n_sem_ch), jnp.float32)
        carry_ctr = jnp.zeros((mid, h4, w4, 1), jnp.float32)
        carry_off = jnp.zeros((mid, h4, w4, 2), jnp.float32)

        # chunking: blocks never straddle a chunk, so chunk size is a
        # multiple of B; default = whole volume, capped at ~2 GB per
        # chunk so multi-10GB volumes coexist with model + activations
        # in HBM (~16 GB) while double-buffering
        if chunk_slices is None:
            per_slice = ph * pw * volume.dtype.itemsize
            cap = max(B, int((2 << 30) // max(per_slice, 1)) // B * B)
            chunk_len = min(n_padded, cap)
        else:
            chunk_len = max(B, (chunk_slices // B) * B)

        def upload(c0):
            """Pad + upload chunk starting at z=c0 (async device_put);
            returns (device chunk, device chunk-base scalar)."""
            end = min(c0 + chunk_len, n)
            part = volume[c0:end]
            pads = [(0, c0 + chunk_len - end
                     if c0 + chunk_len > n else 0),
                    (0, ph - oh), (0, pw - ow)]
            if any(p[1] for p in pads):
                part = np.pad(part, pads)
            return (jax.device_put(np.ascontiguousarray(part)),
                    jnp.int32(c0))

        chunk_starts = list(range(0, n_padded, chunk_len))
        chunks = {0: upload(chunk_starts[0])}

        # scan groups: runs of consecutive blocks inside one chunk; each
        # group is ONE dispatch (lax.scan) + ONE packed D2H
        groups = []  # [(ci, [block_start, ...])]
        for ci, c0 in enumerate(chunk_starts):
            in_chunk = [s for s in block_starts
                        if c0 <= s < c0 + chunk_len]
            for g0 in range(0, len(in_chunk), self.scan_blocks):
                groups.append((ci, in_chunk[g0:g0 + self.scan_blocks]))

        inflight = deque()
        depth = max(self.pipeline_depth, 0)
        z0 = jnp.int32(block_starts[0])
        self.last_dispatch_count = 0
        for gi, (ci, starts) in enumerate(groups):
            if ci + 1 < len(chunk_starts) and (ci + 1) not in chunks:
                # double-buffer the next chunk while this one computes
                chunks[ci + 1] = upload(chunk_starts[ci + 1])
            if ci - 1 in chunks and ci > 0:
                del chunks[ci - 1]
            chunk, chunk_base = chunks[ci]

            fn = self._fn_for_scan_len(fn_key, len(starts))
            if fn not in self._abstract_by_fn:
                self._abstract_by_fn[fn] = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                    (self.variables, carry_sem, carry_ctr, carry_off,
                     z0, chunk, chunk_base))
            (carry_sem, carry_ctr, carry_off, z0, pan,
             packed) = fn(
                self.variables, carry_sem, carry_ctr, carry_off,
                z0, chunk, chunk_base)
            self.last_dispatch_count += 1
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
            group = _PackedGroup(packed)

            for i, block_start in enumerate(starts):
                z_indices = [
                    block_start + j - mid
                    if 0 <= block_start + j - mid < n else None
                    for j in range(B)
                ]
                inflight.append((z_indices, _BlockView(pan, i),
                                 _PackedView(group, i)))
            while len(inflight) > depth:
                yield inflight.popleft()
        while inflight:
            yield inflight.popleft()

    # -----------------------------------------------------------------

    def _fn_for_scan_len(self, fn_key, k):
        """Jitted resident scan fn for a group of k blocks (the tail
        group of a chunk may be shorter than scan_blocks)."""
        key = fn_key + (k,)
        if key not in self._block_fns:
            self._block_fns[key] = self._build_resident(
                *self._resident_args[fn_key], scan_k=k)
        # cost analysis (MFU) reflects the largest scan length in use
        if getattr(self, "_block_fn_k", 0) <= k:
            self._block_fn = self._block_fns[key]
            self._block_fn_k = k
        return self._block_fns[key]

    def _flush_group(self, pending):
        """pending: [(z_indices, pan, packed_dev)] -> emit tuples whose
        packed entries share ONE device-stacked buffer / D2H."""
        if len(pending) == 1:
            z, pan, packed = pending[0]
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
            return [(z, pan, packed)]
        stacked = jnp.stack([p for (_, _, p) in pending])
        try:
            stacked.copy_to_host_async()
        except Exception:
            pass
        group = _PackedGroup(stacked)
        return [(z, pan, _PackedView(group, i))
                for i, (z, pan, _) in enumerate(pending)]

    def block_cost_analysis(self):
        """XLA cost analysis (flops, bytes) of the compiled block
        function — for MFU reporting. Available after the first
        dispatch; returns None if unavailable."""
        args = self._abstract_by_fn.get(self._block_fn)
        if args is None:
            return None
        try:
            lowered = self._block_fn.lower(*args)
            return lowered.compile().cost_analysis()
        except Exception:
            return None

    def infer_stack(self, dataset, upsampling=1):
        """Per-slice view: yields (z, pan_slice, (starts, ends, values,
        n_runs)) — convenience for tests/small volumes; prefer
        infer_blocks + ForwardMatcher.put_block on real devices.

        pan_slice and the run coordinates are in TRUE crop shape: the
        blocks carry lane-aligned padded maps (see postprocess_one);
        this view rebases them on the host."""
        from empanada_tpu.inference.rle import unpack_packed_runs

        for z_indices, pan, packed in self.infer_blocks(dataset, upsampling):
            arr = np.asarray(packed)
            if arr.ndim == 1:
                arr = arr.reshape(len(z_indices), -1, 3)
            pad_shape = tuple(pan.shape[-2:])
            for j, z in enumerate(z_indices):
                if z is None:
                    continue
                n_runs = arr[j, 0, 0]
                starts, ends, values, (oh, ow) = unpack_packed_runs(
                    arr[j], pad_shape)
                if starts is None:  # overflow: consumer uses the pan map
                    starts = arr[j, 1:, 0]
                    ends = arr[j, 1:, 1]
                    values = arr[j, 1:, 2]
                yield z, pan[j][:oh, :ow], (starts, ends, values, n_runs)

    def infer_blocks(self, dataset, upsampling=1):
        assert math.log2(upsampling).is_integer()
        render_steps = int(2 + math.log2(upsampling))
        ks, mid = self.ks, self.mid
        n = len(dataset)

        ex0 = dataset[0]
        img0 = np.asarray(ex0["image"])
        if self.device_norms is None and img0.dtype != np.float32:
            img0 = img0.astype(np.float32)
        ph = (-img0.shape[0]) % self.padding_factor + img0.shape[0]
        pw = (-img0.shape[1]) % self.padding_factor + img0.shape[1]
        B = self._resolve_block((ph, pw), n)
        H, W = ph * upsampling, pw * upsampling  # sem resolution
        if self._num_classes is None:
            self._num_classes = max(
                int(getattr(self.module, "num_classes", 1)),
                (max(self.thing_list) + 1) if self.thing_list else 1, 2)
        # D2H bandwidth through the tunnel is ~30x scarcer than H2D
        # (docs/performance.md), so the packed budget is tight: 8 runs per
        # output row covers realistic EM content; an overflowing slice
        # falls back to pulling its dense pan plane (1 well-laid-out MB)
        # auto run budget scales with the instance budget: at the
        # product's hundreds of instances/slice (label_divisor 20000,
        # reference pdl_inference3d.py:28-31) each instance contributes
        # ~one run per row it spans, so 8*H alone systematically
        # overflows and every slice falls back to a dense-map pull
        max_runs = self.max_runs or self._auto_max_runs(H, W)

        fn_key = (render_steps, upsampling, tuple(ex0["size"]), max_runs,
                  (ph, pw), img0.dtype.str, B)
        if fn_key not in self._block_fns:
            self._block_fns[fn_key] = self._build(
                self._num_classes, render_steps, upsampling, max_runs,
                tuple(ex0["size"]), (ph, pw), B)
        self._block_fn = self._block_fns[fn_key]

        # sem channel count: 1 for binary models, C for multiclass
        n_sem_ch = getattr(self.module, "num_classes", 1)
        # ctr/offsets live at 1/4 of the *padded input* resolution when
        # coarse, else at full padded input resolution
        h4 = ph // 4 if self.coarse_boundaries else ph
        w4 = pw // 4 if self.coarse_boundaries else pw
        carry_sem = jnp.zeros((ks - 1, H, W, n_sem_ch), jnp.float32)
        carry_ctr = jnp.zeros((mid, h4, w4, 1), jnp.float32)
        carry_off = jnp.zeros((mid, h4, w4, 2), jnp.float32)

        # emit z = block_start + j - mid; cover z in [0, n): block starts
        # range over [0, n + mid) so the tail flushes
        block_starts = list(range(0, n + mid, B))
        flat_io = self._mesh is None

        def load_block(block_start):
            """Read + pad one block of slices (runs on a prefetch
            thread, overlapping volume IO with device compute — the
            reference's DataLoader-worker role)."""
            images = []
            use_median = []
            for j in range(B):
                src = block_start + j
                if src < n:
                    ex = dataset[src] if src != 0 else ex0
                    img = np.asarray(ex["image"])[..., None]
                    if self.device_norms is None \
                            and img.dtype != np.float32:
                        img = img.astype(np.float32)
                else:
                    ex = None
                    img = np.zeros_like(img0)[..., None]
                images.append(img)
                z = block_start + j - mid
                use_median.append(mid <= z < n - mid)
            batch = np.stack(images)
            batch, _ = factor_pad(batch, self.padding_factor)
            batch = np.asarray(batch)
            if flat_io:
                batch = np.ascontiguousarray(batch).reshape(-1)
            return batch, np.asarray(use_median)

        from concurrent.futures import ThreadPoolExecutor

        depth = max(self.pipeline_depth, 0)
        pool = ThreadPoolExecutor(max_workers=1)
        load_futs = {}
        n_blocks = len(block_starts)
        prefetch = depth + 2

        def ensure_loads(upto):
            for k in range(upto):
                if k < n_blocks and k not in load_futs:
                    load_futs[k] = pool.submit(load_block, block_starts[k])

        ensure_loads(prefetch)

        inflight = deque()
        pending = []
        self.last_dispatch_count = 0
        # grouping needs flat 1D packed buffers (mesh path keeps (B,R,3))
        group_k = self.d2h_group if flat_io else 1
        for bi, block_start in enumerate(block_starts):
            batch, use_median = load_futs.pop(bi).result()
            ensure_loads(bi + 1 + prefetch)
            if self._image_sharding is not None:
                batch = jax.device_put(batch, self._image_sharding)
            um = jnp.asarray(use_median)

            batch = jnp.asarray(batch)
            if self._block_fn not in self._abstract_by_fn:
                self._abstract_by_fn[self._block_fn] = \
                    jax.tree_util.tree_map(
                        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                        (self.variables, carry_sem, carry_ctr, carry_off,
                         batch, um))
            (carry_sem, carry_ctr, carry_off, pan, packed) = self._block_fn(
                self.variables, carry_sem, carry_ctr, carry_off,
                batch, um)
            self.last_dispatch_count += 1

            # map block rows -> z indices (None = padding rows); the full
            # (B, ...) arrays are yielded unsliced so the consumer's D2H
            # is one whole-array transfer (no extra slice ops)
            z_indices = [
                block_start + j - mid
                if 0 <= block_start + j - mid < n else None
                for j in range(B)
            ]
            # pan stays lane-aligned (padded); the packed header carries
            # the true crop shape for the host-side rebase
            # (rle.unpack_packed_runs)
            pending.append((z_indices, pan, packed))
            if len(pending) >= group_k:
                inflight.extend(self._flush_group(pending))
                pending = []
            while len(inflight) > depth:
                yield inflight.popleft()
            if block_start + B - mid >= n:
                break
        if pending:
            inflight.extend(self._flush_group(pending))
        while inflight:
            yield inflight.popleft()
        pool.shutdown(wait=False)

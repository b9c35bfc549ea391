"""Panoptic post-processing as fused on-device XLA ops (NHWC, jit-static).

Functional parity with reference inference/postprocess.py:38-356, redesigned
for the TPU compilation model:

- ``find_instance_centers``: threshold + max-pool NMS like the reference,
  but returns a *fixed-size* (max_centers, 2) coordinate buffer + validity
  mask via top_k instead of a dynamic nonzero.
- ``group_pixels``: nearest-center assignment as ONE fused (HW, K)
  distance slab folded into an argmin reduce (XLA fuses the broadcast
  into the reduction — no materialization), falling back to a lax.scan
  over center chunks above a slab budget, bounding memory exactly like
  the reference's chunked_pixel_grouping without host loops.
- ``merge_semantic_and_instance``: the reference's per-instance Python
  loops (majority class vote, per-class renumbering, stuff-area filter)
  become segment reductions: one scatter-add builds the (instance, class)
  count table, argmax gives the majority class, a cumulative count over
  (class-sorted) instances reproduces the per-class 1-based renumbering,
  and a gather paints the panoptic map. No data-dependent shapes anywhere.

Conventions: ids and semantics follow the reference exactly —
pan_id = class_id * label_divisor + instance_id; instance ids are numbered
per class in ascending original-instance-id order; stuff regions below
stuff_area become void_label.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "logits_to_prob",
    "harden_semantic",
    "find_instance_centers",
    "group_pixels",
    "median_small",
    "merge_semantic_and_instance",
    "merge_semantic_and_instance_coarse",
    "weighted_bincount",
    "get_panoptic_segmentation",
]


def median_small(window, axis=0):
    """Elementwise median over a SMALL window axis via a pairwise
    sorting network (k^2/2 min/max VPU ops). jnp.median sorts with a
    transpose on TPU and costs ~500 ms at stack scale; this is ~1 ms
    for the qlen<=11 windows the engines use."""
    k = window.shape[axis]
    arrs = [jax.lax.index_in_dim(window, i, axis, keepdims=False)
            for i in range(k)]
    for i in range(k):
        for j in range(k - 1 - i):
            lo = jnp.minimum(arrs[j], arrs[j + 1])
            hi = jnp.maximum(arrs[j], arrs[j + 1])
            arrs[j], arrs[j + 1] = lo, hi
    return arrs[k // 2]


def logits_to_prob(logits: jax.Array) -> jax.Array:
    """softmax over channels (multiclass) or sigmoid (binary). NHWC."""
    if logits.shape[-1] > 1:
        return jax.nn.softmax(logits, axis=-1)
    return jax.nn.sigmoid(logits)


def harden_semantic(sem_prob: jax.Array, confidence_thr: float = 0.5) -> jax.Array:
    """(N, H, W, C) probabilities -> (N, H, W) int32 class ids."""
    if sem_prob.shape[-1] > 1:
        return jnp.argmax(sem_prob, axis=-1).astype(jnp.int32)
    return (sem_prob[..., 0] >= confidence_thr).astype(jnp.int32)


def find_instance_centers(
    ctr_hmp: jax.Array,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    max_centers: int = 256,
):
    """Center NMS (reference postprocess.py:38-76) with a static-size output.

    Args:
        ctr_hmp: (H, W) or (H, W, 1) raw heatmap.
    Returns:
        centers: (max_centers, 2) int32 (y, x), sorted by descending score.
        valid: (max_centers,) bool mask of real detections.
    """
    if ctr_hmp.ndim == 3:
        ctr_hmp = ctr_hmp[..., 0]
    h, w = ctr_hmp.shape
    x = jnp.where(ctr_hmp > threshold, ctr_hmp, -1.0)

    pad = nms_kernel // 2
    pooled = nn.max_pool(
        x[None, :, :, None], (nms_kernel, nms_kernel), strides=(1, 1),
        padding=[(pad, pad), (pad, pad)])[0, :, :, 0]

    is_peak = (x == pooled) & (x > 0)
    # unique peak per plateau is guaranteed by strict float comparison in
    # the reference too; ties across a plateau produce multiple centers in
    # both implementations.
    scores = jnp.where(is_peak, x, -jnp.inf).reshape(-1)
    # tiny grids (shallow-volume orthoplane slices at 1/4 res) can have
    # fewer pixels than the center budget
    k = min(max_centers, scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores, k)
    if k < max_centers:
        pad = max_centers - k
        top_scores = jnp.concatenate(
            [top_scores, jnp.full((pad,), -jnp.inf, top_scores.dtype)])
        top_idx = jnp.concatenate(
            [top_idx, jnp.zeros((pad,), top_idx.dtype)])
    valid = top_scores > 0
    # reference orders centers by row-major nonzero scan
    # (postprocess.py:75); the per-class instance renumbering depends on
    # this order, so sort valid centers by flat index (invalid go last).
    sort_key = jnp.where(valid, top_idx, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(sort_key)
    top_idx = top_idx[order]
    valid = valid[order]
    ys = (top_idx // w).astype(jnp.int32)
    xs = (top_idx % w).astype(jnp.int32)
    centers = jnp.stack([ys, xs], axis=-1)
    return centers, valid


def group_pixels(
    centers: jax.Array,
    valid: jax.Array,
    offsets: jax.Array,
    step: float = 1.0,
    chunk: int = 64,
    use_pallas: bool | None = None,
):
    """Assign each pixel the id (1-based) of its nearest offset-shifted center.

    Args:
        centers: (K, 2) int32 (y, x) in grid units of the offsets map.
        valid: (K,) bool.
        offsets: (H, W, 2) float (dy, dx) in *full-resolution* units.
        step: full-res pixels per offsets-grid cell (4 for the coarse path,
            reference engines.py:263).
        use_pallas: route through the Pallas VMEM-streaming kernel
            (ops/pallas_group.py). Default OFF: the kernel's 256-deep
            fori_loop of scalar-broadcast vector ops measured 8x SLOWER
            than letting XLA fuse the whole (HW, K) distance slab into
            one argmin reduce (8.7 vs 1.1 ms per 8x128^2x256 batch,
            same-process alternated, bit-identical output — probe
            2026-08-17). Opt in with EMPANADA_PALLAS_GROUP=1.
    Returns:
        instance_ids: (H, W) int32; 0 only if no valid centers.
    """
    if use_pallas is None:
        import os

        use_pallas = (jax.default_backend() not in ("cpu",)
                      and os.environ.get("EMPANADA_PALLAS_GROUP") == "1")
    if use_pallas:
        from empanada_tpu.ops.pallas_group import group_pixels_pallas

        return group_pixels_pallas(centers, valid, offsets, step=step)
    h, w, _ = offsets.shape
    k = centers.shape[0]
    assert k % chunk == 0 or k < chunk, "max_centers must be divisible by chunk"

    ys = jnp.arange(h, dtype=jnp.float32) * step
    xs = jnp.arange(w, dtype=jnp.float32) * step
    coord = jnp.stack(
        [ys[:, None] + jnp.zeros((1, w)), xs[None, :] + jnp.zeros((h, 1))],
        axis=-1)
    loc = (coord + offsets.astype(jnp.float32)).reshape(-1, 2)  # (HW, 2)

    ctr = centers.astype(jnp.float32) * step
    big = jnp.float32(1e10)

    # one fused slab: XLA folds the broadcasted distance computation into
    # the argmin reduce (no (HW, K) materialization), so the whole
    # assignment is a single VPU pass. Guarded by a slab budget in case a
    # fine-boundaries full-res call with huge K would materialize.
    any_valid = jnp.any(valid)
    if h * w * k <= (1 << 25):
        dy = loc[:, 0][:, None] - ctr[None, :, 0]
        dx = loc[:, 1][:, None] - ctr[None, :, 1]
        d = jnp.where(valid[None, :], dy * dy + dx * dx, big)
        ids = 1 + jnp.argmin(d, axis=1).astype(jnp.int32)
        # with zero valid centers argmin picks index 0 arbitrarily; the
        # contract (and reference get_instance_segmentation on empty ctr)
        # is all-zero ids
        return jnp.where(any_valid, ids, 0).reshape(h, w)

    def sq_dist(c):
        # squared euclidean distance — argmin-equivalent to the reference's
        # torch.norm and cheaper on the VPU
        diff = c[:, None, :] - loc[None, :, :]
        return jnp.sum(diff * diff, axis=-1)

    if k <= chunk:
        d = jnp.where(valid[:, None], sq_dist(ctr), big)
        ids = 1 + jnp.argmin(d, axis=0).astype(jnp.int32)
        return jnp.where(any_valid, ids, 0).reshape(h, w)

    n_chunks = k // chunk
    ctr_chunks = ctr.reshape(n_chunks, chunk, 2)
    valid_chunks = valid.reshape(n_chunks, chunk)

    def body(carry, inp):
        best_d, best_id = carry
        ctr_c, valid_c, base = inp
        d = jnp.where(valid_c[:, None], sq_dist(ctr_c), big)
        min_d = jnp.min(d, axis=0)
        min_i = jnp.argmin(d, axis=0).astype(jnp.int32) + base + 1
        take = min_d < best_d
        return (jnp.where(take, min_d, best_d),
                jnp.where(take, min_i, best_id)), None

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    init = (jnp.full((h * w,), big, jnp.float32),
            jnp.zeros((h * w,), jnp.int32))
    (best_d, best_id), _ = jax.lax.scan(
        body, init, (ctr_chunks, valid_chunks, bases))
    return best_id.reshape(h, w)


def weighted_bincount(bins, weights, n_bins):
    """Weighted histogram without scatter (TPU-safe): a one-hot f32
    matvec on the MXU. The previous sort + cumsum + searchsorted design
    cost two device sorts and a vmapped while-loop per call (~3 ms per
    8x512^2 block in the device trace); the one-hot contraction is ~free.

    EXACTNESS BOUND (callers must respect it): under TPU default matmul
    precision the f32 weights operand may be truncated to bf16 (8-bit
    mantissa), so each individual weight must be an integer <= 256 to be
    representable exactly; per-bin sums must stay < 2^24 (f32 integer
    accumulation). The one-hot side is 0/1 (exact at any precision).
    Current callers pass per-cell pixel counts <= scale^2 = 16, well
    inside the bound. For larger integer weights, digit-split like
    _small_table_lookup_int instead of calling this."""
    oh = (bins[:, None] == jnp.arange(n_bins, dtype=bins.dtype))
    return (weights.astype(jnp.float32) @ oh.astype(jnp.float32)
            ).astype(weights.dtype)


def vote_count_table_coarse(ins_coarse, sem, thing_mask_table, scale,
                            n_ins, n_classes):
    """counts[k, c] for the render path where instance cells are constant
    over scale x scale blocks: per-cell per-class pixel counts (avg-pool
    style reshape sums) feed a weighted sort-histogram over the COARSE
    grid — 16x fewer elements to sort than the full-res path.

    sem: (H, W) int32 hardened classes (H, W divisible by scale);
    ins_coarse: (H/scale, W/scale) int32.
    """
    h, w = sem.shape
    hc, wc = h // scale, w // scale
    sem_cells = sem.reshape(hc, scale, wc, scale)
    ins_flat = ins_coarse.reshape(-1)

    n_bins = n_ins * n_classes
    counts = jnp.zeros((n_ins * n_classes,), jnp.int32)
    for c in range(n_classes):
        cell_cnt = jnp.sum((sem_cells == c), axis=(1, 3)).reshape(-1)
        # votes need is_thing_px: class c contributes only if it IS thing
        cell_cnt = cell_cnt * thing_mask_table[c].astype(jnp.int32)
        valid = ins_flat > 0
        bins = jnp.where(valid, ins_flat * n_classes + c, n_bins)
        counts = counts + weighted_bincount(
            bins, jnp.where(valid, cell_cnt, 0), n_bins)
    return counts.reshape(n_ins, n_classes)


def _class_select(table, sem_f, num_classes):
    """table[sem_f] for a tiny per-class table WITHOUT an XLA gather:
    TPU lowers small-table gathers over millions of indices very poorly
    (measured 61 ms for 4M lookups from a 257-entry table vs ~0 for the
    equivalent compare+select chain). num_classes is static and small."""
    out = jnp.full(sem_f.shape, table[0], table.dtype)
    for c in range(1, num_classes):
        out = jnp.where(sem_f == c, table[c], out)
    return out


def _small_table_lookup_f32(table, idx, n):
    """table[idx] for a small (n,) table over many indices as a one-hot
    matmul — rides the MXU instead of TPU's slow small-table gather path.

    EXACTNESS: TPU matmuls truncate f32 operands to bf16 by default, so
    this is only exact for integer table values <= 256 (bf16's exact
    integer range; the one-hot side is 0/1 and accumulation is f32).
    Callers with larger values must split them into <=256-valued parts
    (see _instance_paint_tables)."""
    oh = (idx[..., None] == jnp.arange(n, dtype=idx.dtype))
    return oh.astype(jnp.float32) @ table.astype(jnp.float32)


def _small_table_lookup_int(table, idx, n):
    """EXACT non-negative-integer table[idx] (values < 65536) as two
    base-256 digit lookups — each digit is <= 255 and therefore exact
    even if the TPU matmul truncates f32 operands to bf16 (measured
    exact at default precision on v5e + jax 0.9, but the digit split
    stays correct under any jax_default_matmul_precision setting)."""
    table = table.astype(jnp.int32)
    lo = _small_table_lookup_f32(table % 256, idx, n)
    hi = _small_table_lookup_f32(table // 256, idx, n)
    return hi.astype(jnp.int32) * 256 + lo.astype(jnp.int32)


def _vote_count_table(ins_f, sem_f, mask, n_ins, n_classes):
    """counts[k, c] = #pixels with ins==k, sem==c, mask.

    TPU-friendly histogram: scatter-add serializes on TPU, so sort the
    combined (ins, sem) bin ids and take bin boundaries with
    searchsorted — one O(P log P) device sort + 515 binary searches."""
    n_bins = n_ins * n_classes
    combined = ins_f.astype(jnp.int32) * n_classes + sem_f.astype(jnp.int32)
    combined = jnp.where(mask, combined, n_bins)  # masked -> overflow bin
    sorted_ids = jax.lax.sort(combined)
    edges = jnp.searchsorted(sorted_ids,
                             jnp.arange(n_bins + 1, dtype=jnp.int32))
    counts = (edges[1:] - edges[:-1]).astype(jnp.int32)
    return counts.reshape(n_ins, n_classes)


def merge_semantic_and_instance(
    sem: jax.Array,
    ins: jax.Array,
    label_divisor: int,
    thing_mask_table: jax.Array,
    stuff_area: int,
    void_label: int,
    max_centers: int,
    num_classes: int,
):
    """Vectorized panoptic merge (reference postprocess.py:223-296).

    Args:
        sem: (H, W) int32 hardened class ids.
        ins: (H, W) int32 instance ids (0 = background), values <= max_centers.
        thing_mask_table: (num_classes,) bool — True where class is a thing.
    Returns:
        pan: (H, W) int32 panoptic ids.
    """
    sem_f = sem.reshape(-1)
    # mask instances to thing pixels exactly as _paint_panoptic will,
    # so votes and painting share one mask definition
    is_thing_px = _class_select(thing_mask_table, sem_f, num_classes)
    ins_f = jnp.where(is_thing_px, ins.reshape(-1), 0)
    vote_mask = ins_f > 0

    # counts[k, c] = #pixels with (ins==k, sem==c, vote_mask). A
    # scatter-add here serializes on TPU (colliding indices), so the
    # table is built via a sort-based histogram instead.
    counts = _vote_count_table(
        ins_f, sem_f, vote_mask, max_centers + 1, num_classes)
    return _merge_from_counts(
        sem, ins, counts, thing_mask_table, label_divisor, stuff_area,
        void_label, max_centers, num_classes)


def merge_semantic_and_instance_coarse(
    sem, ins_coarse, scale, label_divisor, thing_mask_table, stuff_area,
    void_label, max_centers, num_classes,
):
    """Render-path merge: instance cells are constant over scale x scale
    blocks (nearest-upsampled from the coarse grouping grid), so the
    majority vote AND the per-instance paint lookup run on the coarse
    grid — scale^2 fewer elements through the histogram sort and the
    instance-table lookup. Semantics match merge_semantic_and_instance
    exactly for block-constant ins."""
    counts = vote_count_table_coarse(
        ins_coarse, sem, thing_mask_table, scale, max_centers + 1,
        num_classes)
    cls_tbl, nid_tbl = _instance_paint_tables(counts, max_centers)
    # paint values are block-constant: look up at coarse res, upsample;
    # class and renumbered-id ride separate EXACT digit lookups and
    # combine on the VPU (paint = cls * label_divisor + nid can exceed
    # the matmul-exact range)
    kk = max_centers + 1
    idx = ins_coarse.reshape(-1)
    cls_c = _small_table_lookup_int(cls_tbl, idx, kk)
    nid_c = _small_table_lookup_int(nid_tbl, idx, kk)
    paint_c = jnp.where(nid_c > 0, cls_c * label_divisor + nid_c, 0)
    paint_c = paint_c.reshape(ins_coarse.shape)
    paint = jnp.repeat(jnp.repeat(paint_c, scale, axis=0), scale, axis=1)
    ins = jnp.repeat(jnp.repeat(ins_coarse, scale, axis=0), scale, axis=1)
    return _paint_panoptic(sem, ins, paint, thing_mask_table,
                           label_divisor, stuff_area, void_label,
                           num_classes)


def _instance_paint_tables(counts, max_centers):
    """Per-instance (majority class, per-class 1-based renumbering)
    tables, each (K+1,) int32 with 0 marking absent instances (present
    instances always get new_id >= 1). Kept as SEPARATE tables so the
    exact digit-matmul lookup applies (combined paint ids overflow the
    exact range at production label_divisors)."""
    counts = counts.at[0].set(0)  # drop the dump row
    inst_area = counts.sum(axis=1)                 # (K+1,)
    inst_class = jnp.argmax(counts, axis=1).astype(jnp.int32)
    inst_present = inst_area > 0

    # new_id[k] = 1 + #present instances j<k with the same class
    same_class = inst_class[:, None] == inst_class[None, :]   # (K+1, K+1)
    kk = max_centers + 1
    lower = (jnp.arange(kk)[None, :] < jnp.arange(kk)[:, None])
    prior = jnp.sum(same_class & lower & inst_present[None, :], axis=1)
    new_id = jnp.where(inst_present, prior.astype(jnp.int32) + 1, 0)
    return inst_class, new_id


def _paint_panoptic(sem, ins, paint, thing_mask_table, label_divisor,
                    stuff_area, void_label, num_classes):
    """Combine full-res semantics with per-pixel instance paint values
    (paint[p] = pan id of the instance at p, 0 if absent). All per-class
    lookups are compare+select chains — no TPU gathers."""
    h, w = sem.shape
    sem_f = sem.reshape(-1)
    paint_f = paint.reshape(-1)
    is_thing_px = _class_select(thing_mask_table, sem_f, num_classes)
    # restrict instance ids to thing pixels (reference
    # get_instance_segmentation/get_panoptic_seg)
    thing_seg = is_thing_px & (ins.reshape(-1) > 0)

    # --- stuff areas (num_classes is small: direct per-class sums) -----
    stuff_mask_px = ~thing_seg
    class_area = jnp.stack([
        jnp.sum((sem_f == c) & stuff_mask_px, dtype=jnp.int32)
        for c in range(num_classes)
    ])
    stuff_keep = (~thing_mask_table) & (class_area >= stuff_area)

    # --- paint ----------------------------------------------------------
    pan = jnp.full_like(sem_f, void_label)
    # stuff first (things overwrite, matching reference order where thing
    # pixels always win because stuff is only painted where ~thing_seg)
    stuff_val = sem_f * label_divisor
    pan = jnp.where(
        stuff_mask_px & _class_select(stuff_keep, sem_f, num_classes),
        stuff_val, pan)
    pan = jnp.where(thing_seg & (paint_f > 0), paint_f, pan)
    return pan.reshape(h, w)


def _merge_from_counts(sem, ins, counts, thing_mask_table, label_divisor,
                       stuff_area, void_label, max_centers, num_classes):
    cls_tbl, nid_tbl = _instance_paint_tables(counts, max_centers)
    kk = max_centers + 1
    ins_f = ins.reshape(-1)
    cls = _small_table_lookup_int(cls_tbl, ins_f, kk)
    nid = _small_table_lookup_int(nid_tbl, ins_f, kk)
    paint = jnp.where(nid > 0, cls * label_divisor + nid, 0)
    return _paint_panoptic(sem, ins, paint.reshape(ins.shape),
                           thing_mask_table, label_divisor, stuff_area,
                           void_label, num_classes)


def get_panoptic_segmentation(
    sem_prob: jax.Array,
    ctr_hmp: jax.Array,
    offsets: jax.Array,
    thing_list,
    label_divisor: int = 1000,
    stuff_area: int = 64,
    void_label: int = 0,
    threshold: float = 0.1,
    nms_kernel: int = 7,
    confidence_thr: float = 0.5,
    max_centers: int = 256,
    num_classes: int | None = None,
):
    """Full single-image panoptic pipeline on device.

    Args:
        sem_prob: (H, W, C) semantic probabilities (NOT logits).
        ctr_hmp: (H, W) or (H, W, 1) center heatmap.
        offsets: (H, W, 2) center offsets.
    Returns:
        pan: (H, W) int32 panoptic segmentation.
    """
    if num_classes is None:
        num_classes = max(int(sem_prob.shape[-1]), max(thing_list) + 1, 2)
    sem = harden_semantic(sem_prob, confidence_thr)

    centers, valid = find_instance_centers(
        ctr_hmp, threshold, nms_kernel, max_centers)
    ins = group_pixels(centers, valid, offsets)

    thing_table = jnp.zeros((num_classes,), bool)
    for t in thing_list:
        thing_table = thing_table.at[t].set(True)

    # zero instance ids where there are no valid centers at all
    any_center = jnp.any(valid)
    ins = jnp.where(any_center, ins, 0)
    # restrict instances to thing pixels (reference get_instance_segmentation)
    ins = jnp.where(thing_table[sem], ins, 0)

    return merge_semantic_and_instance(
        sem, ins, label_divisor, thing_table, stuff_area, void_label,
        max_centers, num_classes)

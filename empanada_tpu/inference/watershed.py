"""Boundary-contour decoding: 3D watershed instance extraction.

Parity with reference inference/watershed.py:37-172 (itself from
pytorch_connectomics) without skimage/cc3d/numba:

- seeds = (semantic > thres1) & (boundary < thres2), 26-conn components,
  size-filtered;
- instances flood the foreground mask (semantic > thres3) from the seeds,
  ordered by descending semantic probability.

The flood is fully vectorized: intensities are bucketed into their uint8
levels and labels are propagated level-by-level with whole-volume
neighbor shifts (a discrete priority-flood — identical to skimage
watershed on quantized input up to tie order). ``mask_watershed`` is the
intensity-free variant (BFS rounds), matching the reference's
memory-lean path (watershed.py:89-127).
"""

from __future__ import annotations

import numpy as np

from empanada_tpu.core.ccl3d import connected_components_3d, size_threshold_3d

__all__ = ["bc_watershed", "mask_watershed", "cast2dtype"]


def cast2dtype(segm):
    """Smallest uint dtype that holds the max id
    (reference watershed.py:37-50)."""
    mid = np.max(segm)
    m_type = np.uint64
    if mid < 2 ** 8:
        m_type = np.uint8
    elif mid < 2 ** 16:
        m_type = np.uint16
    elif mid < 2 ** 32:
        m_type = np.uint32
    return segm.astype(m_type)


def _propagate_once(labels, allowed):
    """One 6-neighborhood label-propagation round. Returns (labels,
    n_changed). Ties resolve to the max label (deterministic)."""
    prop = np.zeros_like(labels)
    for axis in (0, 1, 2):
        for shift in (1, -1):
            moved = np.roll(labels, shift, axis=axis)
            # zero the wrapped border
            sl = [slice(None)] * 3
            sl[axis] = 0 if shift == 1 else -1
            moved[tuple(sl)] = 0
            prop = np.maximum(prop, moved)
    fill = (labels == 0) & allowed & (prop > 0)
    if not fill.any():
        return labels, 0
    labels = np.where(fill, prop, labels)
    return labels, int(fill.sum())


def mask_watershed(mask, markers, connectivity=1):
    """BFS flood of a binary mask from markers (reference
    watershed.py:89-127): each round extends labels one voxel into the
    unlabeled mask."""
    labels = np.ascontiguousarray(markers).astype(np.int64)
    mask = np.ascontiguousarray(mask).astype(bool)
    while True:
        labels, changed = _propagate_once(labels, mask)
        if changed == 0:
            break
    return labels


def watershed_descending(intensity, markers, mask):
    """Discrete priority-flood: flood `mask` from `markers` in order of
    descending `intensity` (uint8-bucketed). Equivalent to
    skimage.watershed(-intensity, markers, mask=mask) for integer
    intensities, up to tie-breaking."""
    intensity = np.ascontiguousarray(intensity)
    labels = np.ascontiguousarray(markers).astype(np.int64)
    mask = np.ascontiguousarray(mask).astype(bool)

    levels = np.unique(intensity[mask])[::-1]
    for lvl in levels:
        allowed = mask & (intensity >= lvl)
        while True:
            labels, changed = _propagate_once(labels, allowed)
            if changed == 0:
                break
    return labels


def bc_watershed(volume, thres1=0.9, thres2=0.8, thres3=0.85,
                 seed_thres=32, min_size=128, label_divisor=1000,
                 use_mask_wts=False):
    """Foreground+contour uint8 maps -> instance labels
    (reference watershed.py:129-172).

    Args:
        volume: (2, Z, Y, X) uint8 [semantic*255, contour*255].
    """
    assert volume.shape[0] == 2
    semantic = volume[0]
    boundary = volume[1]
    seed_map = (semantic > int(255 * thres1)) & (boundary < int(255 * thres2))
    foreground = semantic > int(255 * thres3)

    seed = connected_components_3d(seed_map.astype(np.uint8), 26)
    seed = size_threshold_3d(seed, seed_thres)

    if use_mask_wts:
        segm = mask_watershed(foreground, seed)
    else:
        segm = watershed_descending(semantic, seed, foreground)
    segm = segm.astype(np.uint32)

    if min_size is not None:
        segm = size_threshold_3d(segm, min_size)

    segm[segm > 0] += label_divisor
    return cast2dtype(segm)

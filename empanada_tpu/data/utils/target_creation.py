"""Training-target creation: center heatmaps/offsets and contour maps.

Parity with reference data/utils/target_creation.py:13-133, without
skimage/scipy.signal dependencies: centroids come from a vectorized
bincount pass (replacing regionprops), blurring/dilation use cv2.
"""

from __future__ import annotations

import cv2
import numpy as np

__all__ = ["heatmap_and_offsets", "seg_to_instance_bd"]


def _label_centroids(sl2d):
    """(labels, cy, cx) for each nonzero label via one bincount pass."""
    labels = np.unique(sl2d)
    labels = labels[labels > 0]
    if len(labels) == 0:
        return labels, np.array([]), np.array([])
    h, w = sl2d.shape
    flat = sl2d.reshape(-1).astype(np.int64)
    size = int(flat.max()) + 1
    counts = np.bincount(flat, minlength=size)
    yy = np.repeat(np.arange(h, dtype=np.float64), w)
    xx = np.tile(np.arange(w, dtype=np.float64), h)
    ysum = np.bincount(flat, weights=yy, minlength=size)
    xsum = np.bincount(flat, weights=xx, minlength=size)
    cy = ysum[labels] / counts[labels]
    cx = xsum[labels] / counts[labels]
    return labels, cy, cx


def heatmap_and_offsets(sl2d, heatmap_sigma=6):
    """Instance seg (H, W) -> (heatmap (H, W, 1), offsets (H, W, 2)).

    Matches reference target_creation.py:13-78 (channel-last here):
    gaussian-blurred max-normalized center heatmap; per-pixel (dy, dx)
    offsets to the instance centroid, zero outside instances.
    """
    sl2d = np.asarray(sl2d)
    h, w = sl2d.shape
    heatmap = np.zeros((h, w), dtype=np.float32)

    labels, cy, cx = _label_centroids(sl2d)

    # per-pixel center lookup: ctr_y[label] broadcast via the mask
    size = (int(sl2d.max()) + 1) if len(labels) else 1
    ctr_y = np.zeros((size,), np.float32)
    ctr_x = np.zeros((size,), np.float32)
    for lab, y, x in zip(labels, cy, cx):
        heatmap[int(y), int(x)] = 1
        ctr_y[lab] = y
        ctr_x[lab] = x

    if len(labels):
        heatmap = cv2.GaussianBlur(
            heatmap, ksize=(0, 0), sigmaX=heatmap_sigma, sigmaY=heatmap_sigma,
            borderType=cv2.BORDER_CONSTANT)
        hmax = heatmap.max()
        if hmax > 0:
            heatmap = heatmap / hmax

    lab_map = sl2d.astype(np.int64).clip(0, size - 1)
    centers_y = ctr_y[lab_map]
    centers_x = ctr_x[lab_map]
    yindices = np.arange(h, dtype=np.float32)[:, None]
    xindices = np.arange(w, dtype=np.float32)[None, :]
    off_y = centers_y - yindices
    off_x = centers_x - xindices
    fg = sl2d > 0
    off_y[~fg] = 0
    off_x[~fg] = 0

    offsets = np.stack([off_y, off_x], axis=-1).astype(np.float32)
    return heatmap[..., None], offsets


def seg_to_instance_bd(seg, tsz_h=1, do_bg=True, do_convolve=True):
    """Instance seg stack (D, H, W) -> binary contour map (D, H, W) uint8.

    Matches reference target_creation.py:80-133 (sobel-edge + dilation
    path; the im2col variant is subsumed by the convolve path since
    do_bg/do_convolve default True in all reference usage).
    """
    seg = np.asarray(seg)
    sz = seg.shape
    bd = np.zeros(sz, np.uint8)
    tsz = tsz_h * 2 + 1
    kernel = np.ones((tsz, tsz), np.uint8)

    sobel = np.array([1, 0, -1], dtype=np.float64)

    for z in range(sz[0]):
        slide = seg[z].astype(np.float64)
        # 'symm' boundary: pad reflect-101? scipy 'symm' reflects including
        # the edge pixel (cv2 BORDER_REFLECT)
        padded = cv2.copyMakeBorder(slide, 1, 1, 1, 1, cv2.BORDER_REFLECT)
        edge_x = (padded[:-2, 1:-1] - padded[2:, 1:-1])
        edge_y = (padded[1:-1, :-2] - padded[1:-1, 2:])
        edge = np.maximum(np.abs(edge_x), np.abs(edge_y))
        contour = (edge != 0).astype(np.uint8)
        bd[z] = cv2.dilate(contour, kernel)

    return bd

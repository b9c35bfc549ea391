"""Synthetic EM-like volumes with instance ground truth.

Used by the benchmark and tests to create content with realistic
per-slice instance density (tens to hundreds of blobby organelle
cross-sections per plane, like the mitochondria volumes the reference's
MitoNet targets — reference scripts/pdl_inference3d.py operates at
label_divisor 20000 with hundreds of instances per slice).
"""

from __future__ import annotations

import numpy as np

__all__ = ["synthetic_em_volume"]


def synthetic_em_volume(shape, n_instances=40, seed=0, radius=(8, 40),
                        contrast=0.3, noise=0.1, mean=0.5):
    """Dark ellipsoid instances on a noisy background.

    Returns (volume uint8 (D, H, W), gt uint32 instance labels). Later
    instances overwrite earlier ones where they overlap (labels stay
    connected per id in practice at these densities).

    Each ellipsoid is evaluated only inside its bounding box (identical
    output to a full-volume test, since the inside-test is local), so
    product-scale volumes (512^3-1k^3 with thousands of instances) are
    generated in seconds instead of hours.
    """
    rng = np.random.default_rng(seed)
    D, H, W = shape
    vol = rng.normal(mean, noise, shape).astype(np.float32)
    gt = np.zeros(shape, np.uint32)
    for i in range(n_instances):
        r = rng.uniform(radius[0], radius[1], size=3)
        r[0] = min(r[0], D / 3)  # keep z extent inside shallow stacks
        c = [rng.uniform(r[j] * 0.5, s - r[j] * 0.5)
             for j, s in enumerate(shape)]
        lo = [max(int(np.floor(c[j] - r[j])), 0) for j in range(3)]
        hi = [min(int(np.ceil(c[j] + r[j])) + 1, shape[j]) for j in range(3)]
        # float64 with the exact legacy formula so the inside-test is
        # bit-identical to the old full-volume mgrid version
        zz = ((np.arange(lo[0], hi[0], dtype=np.float64)
               - c[0]) ** 2 / r[0] ** 2)[:, None, None]
        yy = ((np.arange(lo[1], hi[1], dtype=np.float64)
               - c[1]) ** 2 / r[1] ** 2)[None, :, None]
        xx = ((np.arange(lo[2], hi[2], dtype=np.float64)
               - c[2]) ** 2 / r[2] ** 2)[None, None, :]
        ball = zz + yy + xx <= 1.0
        sub = (slice(lo[0], hi[0]), slice(lo[1], hi[1]), slice(lo[2], hi[2]))
        vol[sub][ball] -= contrast
        gt[sub][ball] = i + 1
    return (vol.clip(0, 1) * 255).astype(np.uint8), gt

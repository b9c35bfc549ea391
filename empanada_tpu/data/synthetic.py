"""Synthetic EM-like volumes with instance ground truth.

Used by the benchmark and tests to create content with realistic
per-slice instance density (tens of blobby organelle cross-sections per
plane, like the mitochondria volumes the reference's MitoNet targets).
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
    """
    rng = np.random.default_rng(seed)
    D, H, W = shape
    vol = rng.normal(mean, noise, shape).astype(np.float32)
    gt = np.zeros(shape, np.uint32)
    zz, yy, xx = np.mgrid[:D, :H, :W]
    for i in range(n_instances):
        r = rng.uniform(radius[0], radius[1], size=3)
        r[0] = min(r[0], D / 3)  # keep z extent inside shallow stacks
        c = [rng.uniform(r[j] * 0.5, s - r[j] * 0.5)
             for j, s in enumerate(shape)]
        ball = ((zz - c[0]) ** 2 / r[0] ** 2 + (yy - c[1]) ** 2 / r[1] ** 2
                + (xx - c[2]) ** 2 / r[2] ** 2) <= 1.0
        vol[ball] -= contrast
        gt[ball] = i + 1
    return (vol.clip(0, 1) * 255).astype(np.uint8), gt

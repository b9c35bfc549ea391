"""Base dataset: dir-of-subdirs image/mask pairs, dataset addition, and
inverse-count sampling weights (reference data/_base.py:13-121).

Pure numpy — examples are dicts of numpy arrays collated by the loader
(empanada_tpu/data/loader.py) into device-ready batches.
"""

from __future__ import annotations

import os
from copy import deepcopy
from glob import glob

import numpy as np

__all__ = ["BaseDataset", "read_image", "read_mask"]


def read_image(path):
    """Grayscale image -> (H, W) uint8/uint16 numpy."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    if img is None:  # non-cv2-readable formats (e.g. some tiffs)
        import imageio.v3 as iio

        img = np.asarray(iio.imread(path))
        if img.ndim == 3:
            img = img[..., 0]
    return img


def read_mask(path):
    """Label mask -> (H, W) integer numpy, any bit depth preserved."""
    import cv2

    msk = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if msk is None:
        import imageio.v3 as iio

        msk = np.asarray(iio.imread(path))
    if msk.ndim == 3:
        msk = msk[..., 0]
    return msk.astype(np.int64)


class BaseDataset:
    """data_dir -> source subdirs -> images/ masks/ pairs."""

    def __init__(self, data_dir, transforms=None, weight_gamma=None):
        self.data_dir = data_dir
        self.subdirs = sorted(
            sd for sd in os.listdir(data_dir)
            if os.path.isdir(os.path.join(data_dir, sd))
        )

        self.impaths_dict = {}
        self.mskpaths_dict = {}
        for sd in self.subdirs:
            self.impaths_dict[sd] = sorted(
                glob(os.path.join(data_dir, sd, "images", "*")))
            self.mskpaths_dict[sd] = sorted(
                glob(os.path.join(data_dir, sd, "masks", "*")))

        self.weight_gamma = weight_gamma
        self._unpack()
        print(f"Found {len(self.subdirs)} image subdirectories "
              f"with {len(self.impaths)} images.")
        self.transforms = transforms

    def _unpack(self):
        if self.weight_gamma is not None:
            self.weights = self._example_weights(
                self.impaths_dict, gamma=self.weight_gamma)
        else:
            self.weights = None
        self.impaths = [p for ps in self.impaths_dict.values() for p in ps]
        self.mskpaths = [p for ps in self.mskpaths_dict.values() for p in ps]

    def __len__(self):
        return len(self.impaths)

    def __add__(self, other):
        """Merge two datasets; per-subdir weights recalculate
        (reference _base.py:64-95)."""
        merged = deepcopy(self)
        for sd in other.impaths_dict:
            if sd in merged.impaths_dict:
                merged.impaths_dict[sd] += other.impaths_dict[sd]
                merged.mskpaths_dict[sd] += other.mskpaths_dict[sd]
            else:
                merged.impaths_dict[sd] = list(other.impaths_dict[sd])
                merged.mskpaths_dict[sd] = list(other.mskpaths_dict[sd])
        merged._unpack()
        return merged

    @staticmethod
    def _example_weights(paths_dict, gamma=0.3):
        """w_subdir = normalize((1/count)^gamma), repeated per example
        (reference _base.py:97-119)."""
        counts = np.array([len(ps) for ps in paths_dict.values()],
                          dtype=np.float64)
        weights = (1.0 / counts) ** gamma
        weights /= weights.sum()
        example_weights = np.concatenate([
            np.full(int(c), w) for w, c in zip(weights, counts)
        ])
        return example_weights

    def load_pair(self, idx):
        image = read_image(self.impaths[idx])
        mask = read_mask(self.mskpaths[idx])
        if image.ndim == 2:
            image = image[..., None]
        return image, mask

    def __getitem__(self, idx):
        raise NotImplementedError

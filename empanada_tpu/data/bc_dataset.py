"""Boundary-contour dataset (reference data/bc_dataset.py:14-72)."""

from __future__ import annotations

import numpy as np

from empanada_tpu.data._base import BaseDataset
from empanada_tpu.data.utils.target_creation import seg_to_instance_bd

__all__ = ["BCDataset"]


class BCDataset(BaseDataset):
    """Emits {image, sem (binary fg), cnt (binary contour)}."""

    def __init__(self, data_dir, transforms=None, weight_gamma=0.3,
                 **kwargs):
        super().__init__(data_dir, transforms, weight_gamma)

    def __getitem__(self, idx):
        image, mask = self.load_pair(idx)
        if self.transforms is not None:
            output = self.transforms(image=image, mask=mask)
        else:
            output = {"image": image, "mask": mask}

        mask = output["mask"]
        contours = seg_to_instance_bd(mask[None])[0]
        output["sem"] = (mask > 0).astype(np.float32)
        output["cnt"] = (contours > 0).astype(np.float32)
        output["fname"] = self.impaths[idx]
        del output["mask"]
        return output

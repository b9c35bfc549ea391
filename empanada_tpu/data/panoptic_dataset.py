"""Panoptic training dataset (reference data/panoptic_dataset.py:14-104)."""

from __future__ import annotations

import numpy as np

from empanada_tpu.data._base import BaseDataset
from empanada_tpu.data.utils.target_creation import heatmap_and_offsets

__all__ = ["PanopticDataset"]


class PanopticDataset(BaseDataset):
    """Decodes label_divisor panoptic masks into semantic + thing segs and
    emits {image, sem, ctr_hmp, offsets}."""

    def __init__(self, data_dir, labels, thing_list, label_divisor,
                 transforms=None, heatmap_sigma=6, weight_gamma=0.3):
        super().__init__(data_dir, transforms, weight_gamma)
        assert len(labels) > 1, (
            "Must be more than 1 label class! "
            "Use SingleClassInstanceDataset instead.")
        assert all(l > 0 for l in labels), \
            "Labels must be positive non-zero integers!"
        self.labels = labels
        self.thing_list = thing_list
        self.label_divisor = label_divisor
        self.heatmap_sigma = heatmap_sigma

    def __getitem__(self, idx):
        image, mask = self.load_pair(idx)
        if self.transforms is not None:
            output = self.transforms(image=image, mask=mask)
        else:
            output = {"image": image, "mask": mask}

        mask = output["mask"]
        thing_seg = np.zeros_like(mask)
        sem_seg = np.zeros_like(mask)
        for class_id in self.labels:
            min_id = class_id * self.label_divisor
            inside = (mask >= min_id) & (mask < min_id + self.label_divisor)
            sem_seg[inside] = class_id
            if class_id in self.thing_list:
                thing_seg[inside] = mask[inside]

        heatmap, offsets = heatmap_and_offsets(thing_seg, self.heatmap_sigma)
        output["sem"] = sem_seg.astype(np.int32)
        output["ctr_hmp"] = heatmap
        output["offsets"] = offsets
        output["fname"] = self.impaths[idx]
        return output

"""Datasets, loaders, samplers, transforms, and target creation."""

from empanada_tpu.data._base import BaseDataset
from empanada_tpu.data.bc_dataset import BCDataset
from empanada_tpu.data.loader import DataLoader, collate
from empanada_tpu.data.panoptic_dataset import PanopticDataset
from empanada_tpu.data.single_class_instance_dataset import (
    SingleClassInstanceDataset,
)
from empanada_tpu.data.volume_dataset import VolumeDataset

DATASETS = {
    "PanopticDataset": PanopticDataset,
    "SingleClassInstanceDataset": SingleClassInstanceDataset,
    "BCDataset": BCDataset,
}


def create_dataset(name, *args, **kwargs):
    if name not in DATASETS:
        raise ValueError(f"unknown dataset {name!r}; choices: {sorted(DATASETS)}")
    return DATASETS[name](*args, **kwargs)

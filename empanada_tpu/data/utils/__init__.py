from empanada_tpu.data.utils.target_creation import (
    heatmap_and_offsets,
    seg_to_instance_bd,
)
from empanada_tpu.data.utils.transforms import (
    create_augmentations,
    factor_pad_numpy,
    resize_by_factor,
)

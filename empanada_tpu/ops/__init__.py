"""Device-side ops: resizing, sampling, panoptic post-processing, median
filtering, and run-boundary extraction — all jittable with static shapes."""

from empanada_tpu.ops.resize import resize_bilinear, factor_pad, interpolate_scale
from empanada_tpu.ops.sampling import point_sample

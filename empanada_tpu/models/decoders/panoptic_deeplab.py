"""Panoptic-DeepLab decoder (flax.linen, NHWC).

Parity with reference decoders/panoptic_deeplab.py:23-80: ASPP on the
deepest pyramid level, then for each low-level stage (largest stride
first): 1x1 project, bilinear-upsample the running features to the
low-level size (align_corners=True), concat, 5x5 separable-conv fuse.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import ConvBNAct, SeparableConvBNAct, head_normal
from empanada_tpu.models.decoders.aspp import ASPP
from empanada_tpu.ops.resize import resize_bilinear

__all__ = ["PanopticDeepLabDecoder"]


class PanopticDeepLabDecoder(nn.Module):
    decoder_channels: int = 256
    low_level_stages: Sequence[int] = (3, 2, 1)  # pyramid indices
    low_level_channels_project: Sequence[int] = (128, 64, 32)
    atrous_rates: Sequence[int] = (2, 4, 6)
    aspp_channels: Optional[int] = None
    aspp_dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid_features, train: bool = False):
        aspp_ch = self.aspp_channels or self.decoder_channels
        x = ASPP(aspp_ch, self.atrous_rates, self.aspp_dropout,
                 dtype=self.dtype)(pyramid_features[-1], train)

        for i, stage in enumerate(self.low_level_stages):
            low = pyramid_features[stage]
            low = ConvBNAct(self.low_level_channels_project[i], 1,
                            dtype=self.dtype, kernel_init=head_normal,
                            name=f"project_{i}")(low, train)
            x = resize_bilinear(x, low.shape[1:3], align_corners=True)
            x = jnp.concatenate([x, low.astype(x.dtype)], axis=-1)
            x = SeparableConvBNAct(self.decoder_channels, 5, dtype=self.dtype,
                                   kernel_init=head_normal,
                                   name=f"fuse_{i}")(x, train)
        return x

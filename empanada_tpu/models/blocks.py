"""Shared conv blocks (flax.linen, NHWC).

Capability parity with reference empanada/models/blocks.py:15-171, written
as linen modules with explicit train-mode batch-norm handling and a
compute-dtype knob so the whole model runs in bfloat16 on the MXU while
params/BN statistics stay float32.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.ops.resize import interpolate_scale, resize_bilinear

__all__ = [
    "ConvBNAct",
    "SeparableConvBNAct",
    "ConvTransposeBNAct",
    "SqueezeExcite",
    "Resample2d",
    "Interpolate2d",
    "Resize2d",
]

# effdet/pycls-style initializers
conv_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
glorot = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")
head_normal = nn.initializers.normal(stddev=0.001)


class ConvBNAct(nn.Module):
    """conv -> BN -> activation. Grouped-conv capable."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    act: Optional[Callable] = nn.relu
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = conv_kaiming
    final_bn: bool = False  # zero-init BN scale (residual branch trick)

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            dtype=jnp.float32,
            scale_init=nn.initializers.zeros if self.final_bn
            else nn.initializers.ones,
            axis_name=None,
        )(x)
        if self.act is not None:
            x = self.act(x)
        return x.astype(self.dtype)


class SeparableConvBNAct(nn.Module):
    """depthwise conv -> pointwise conv -> BN -> activation."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    act: Optional[Callable] = nn.relu
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = glorot

    @nn.compact
    def __call__(self, x, train: bool = False):
        nin = x.shape[-1]
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            nin,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=nin,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
        )(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=self.kernel_init,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(x)
        if self.act is not None:
            x = self.act(x)
        return x.astype(self.dtype)


class ConvTransposeBNAct(nn.Module):
    """stride==kernel transposed conv -> BN -> activation (2x upsample)."""
    features: int
    kernel_size: int = 2
    act: Optional[Callable] = nn.relu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.kernel_size, self.kernel_size),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=glorot,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         dtype=jnp.float32)(x)
        if self.act is not None:
            x = self.act(x)
        return x.astype(self.dtype)


class SqueezeExcite(nn.Module):
    """Global-pool squeeze-excite with fixed ratio 4 (reference blocks.py:35)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nin = x.shape[-1]
        ns = nin // 4
        s = jnp.mean(x, axis=(1, 2), keepdims=True).astype(self.dtype)
        s = nn.Conv(ns, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=conv_kaiming)(s)
        s = nn.relu(s)
        s = nn.Conv(nin, (1, 1), use_bias=True, dtype=self.dtype,
                    kernel_init=conv_kaiming)(s)
        s = nn.sigmoid(s)
        return x * s


class Resample2d(nn.Module):
    """1x1 conv-bn channel/stride resample; identity when shapes match."""
    features: int
    stride: int = 1
    act: Optional[Callable] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] == self.features and self.stride == 1:
            return x
        return ConvBNAct(self.features, kernel_size=1, stride=self.stride,
                         act=self.act, dtype=self.dtype)(x, train)


class Interpolate2d(nn.Module):
    scale_factor: int
    align_corners: bool = False

    def __call__(self, x):
        return interpolate_scale(x, self.scale_factor, self.align_corners)


class Resize2d(nn.Module):
    """2x resize: nearest upsample or stride-2 3x3 maxpool downsample
    (reference blocks.py:90-106)."""
    scale_factor: int
    up_or_down: str = "up"

    def __call__(self, x):
        if self.up_or_down == "up":
            # nearest-neighbor upsample
            n, h, w, c = x.shape
            return jax.image.resize(
                x, (n, h * self.scale_factor, w * self.scale_factor, c),
                method="nearest")
        return nn.max_pool(x, (3, 3), strides=(self.scale_factor,) * 2,
                           padding=[(1, 1), (1, 1)])

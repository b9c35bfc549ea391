"""Shared conv blocks (flax.linen, NHWC).

Capability parity with reference empanada/models/blocks.py:15-171, written
as linen modules with explicit train-mode batch-norm handling and a
compute-dtype knob so the whole model runs in bfloat16 on the MXU while
params/BN statistics stay float32.
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from empanada_tpu.ops.resize import interpolate_scale, resize_bilinear

__all__ = [
    "ConvBNAct",
    "SpaceToDepthStem",
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


LANE = 128  # TPU vector-register lane width


def _lane_pad_grouped_conv(x, kernel, groups, stride, pad):
    """Grouped conv with each group's INPUT width zero-padded to a
    128-lane multiple. Outputs are numerically the f32-accumulated conv
    (identical math: the padded lanes multiply zero kernel rows).

    Why: MEASURED on the TPU runtime (2026-08-20, docs/performance.md)
    — a feature_group_count conv whose group width is not a 128-lane
    multiple (regnety_6p4gf: cw=72) does not ride the MXU and
    accumulates in bf16, deviating ~25% RMS from the f32-accumulated
    reference; the lane-padded form rides the MXU (faster) and matches
    the CPU reference to bf16 rounding. +(pad/cw) redundant FLOPs, all
    zeros."""
    b, h, w, c = x.shape
    cw = c // groups
    padw = (-cw) % LANE
    xg = x.reshape(b, h, w, groups, cw)
    xg = jnp.pad(xg, ((0, 0),) * 3 + ((0, 0), (0, padw)))
    xp = xg.reshape(b, h, w, groups * (cw + padw))
    kp = jnp.pad(kernel, ((0, 0), (0, 0), (0, padw), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, kp, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


@functools.lru_cache(maxsize=None)
def _platform_needs_lane_pad(backend: str) -> bool:
    """One-time on-device self-check: does THIS backend miscompute
    misaligned grouped convs? Runs the measured failing shape (cw=72,
    g=2) both plain and lane-padded on the default device and compares.
    A healthy backend accumulates both in f32 (diff ~ bf16-multiply
    rounding, <2% of output std); the failing runtime deviates ~200% of
    std (docs/performance.md round 5). Keeps healthy TPUs on the
    cheaper plain conv (~15-19% faster) while broken ones get the
    correct padded path automatically."""
    if backend != "tpu":
        return False
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, 144)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 72, 144)), jnp.float32)
    a = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=2))
    b = np.asarray(_lane_pad_grouped_conv(x, w, 2, 1, 1))
    return float(np.abs(a - b).max()) > 0.1 * (float(a.std()) + 1e-9)


class ConvBNAct(nn.Module):
    """conv -> BN -> activation. Grouped-conv capable.

    ``lane_pad``: None (auto) lane-pads misaligned grouped convs ONLY
    on backends whose plain grouped conv measurably miscomputes
    (_platform_needs_lane_pad self-check; see _lane_pad_grouped_conv).
    On CPU and healthy TPUs the plain conv is used, so tests and
    golden-parity comparisons are unchanged and no speed is paid.
    ``EMPANADA_LANE_PAD=1/0`` forces it either way at trace time.
    True/False force it per-module. The param tree is identical either
    way (Conv_0/kernel)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    act: Optional[Callable] = nn.relu
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = conv_kaiming
    final_bn: bool = False  # zero-init BN scale (residual branch trick)
    lane_pad: Optional[bool] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        cw_in = x.shape[-1] // self.groups
        use_lane_pad = self.lane_pad
        if use_lane_pad is None:
            misaligned = self.groups > 1 and cw_in % LANE != 0
            if not misaligned:
                use_lane_pad = False
            else:
                import os

                env = os.environ.get("EMPANADA_LANE_PAD")
                if env is not None:
                    use_lane_pad = env.lower() not in ("0", "false",
                                                       "off")
                else:
                    use_lane_pad = _platform_needs_lane_pad(
                        jax.default_backend())
        if use_lane_pad:
            # int8 artifacts store quantized kernels as
            # {__int8__, __scale__} subtrees (export.py); the executing
            # interceptor only wraps nn.Conv, so here we dequantize and
            # run the lane-padded bf16 conv (grouped convs measured
            # SLOWER in int8 anyway, tools/probe_int8_mxu.py)
            stored = self.variables.get("params", {}).get("Conv_0", {})
            kq = stored.get("kernel") if hasattr(stored, "get") else None
            if hasattr(kq, "get") and kq.get("__int8__") is not None:
                kernel = (jnp.asarray(kq["__int8__"], self.dtype)
                          * jnp.asarray(kq["__scale__"], self.dtype))
            else:
                kernel = _ConvKernel(
                    (self.kernel_size, self.kernel_size, cw_in,
                     self.features), self.kernel_init, name="Conv_0")()
            x = _lane_pad_grouped_conv(
                x.astype(self.dtype), kernel.astype(self.dtype),
                self.groups, self.stride, pad)
        else:
            x = nn.Conv(
                self.features,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding=[(pad, pad), (pad, pad)],
                feature_group_count=self.groups,
                use_bias=False,
                dtype=self.dtype,
                kernel_init=self.kernel_init,
                name="Conv_0",
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


class _ConvKernel(nn.Module):
    """Declares a conv kernel param without running the conv — used by
    stems that compute an algebraically transformed convolution while
    keeping the EXACT checkpoint param tree of a plain nn.Conv."""
    shape: tuple
    kernel_init: Callable = conv_kaiming

    @nn.compact
    def __call__(self):
        return self.param("kernel", self.kernel_init, self.shape)


class SpaceToDepthStem(nn.Module):
    """3x3/s2 single-channel stem computed as a space-to-depth conv.

    Numerically the SAME layer as ``ConvBNAct(features, 3, stride=2)`` on
    a 1-channel input (identical param tree: Conv_0/kernel +
    BatchNorm_0), but evaluated as: pack 4x4 input patches into 16
    channels (H,W,1 -> H/4,W/4,16), one 2x2 VALID conv with the 3x3
    weights scattered into a (2,2,16,4*features) kernel (each of the 4
    output sub-positions is a channel group), then depth-to-space back
    to (H/2,W/2,features). On TPU the MXU processes 128-lane input
    blocks: a 1-channel conv wastes 127/128 of every pass, while the
    packed form feeds 16 lanes and 4x fewer spatial positions. Same
    FLOP count as im2col of the original; only the layout changes.
    Results match the plain conv to float tolerance (summation order
    differs); H and W must be multiples of 4 (engine padding_factor
    guarantees this).
    """
    features: int
    act: Optional[Callable] = nn.relu
    dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = conv_kaiming

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c_in = x.shape
        assert c_in == 1 and h % 4 == 0 and w % 4 == 0, (x.shape,)
        f = self.features
        w3 = _ConvKernel((3, 3, 1, f), self.kernel_init,
                         name="Conv_0")()

        # scatter the 9 taps into the packed-kernel layout: output
        # sub-position (a, b) of a packed cell reads original rows
        # 2a+dy-1 (dy in 0..2), which live in packed cell tap 0 (the
        # cell above/left, within-cell offset row+4) when row < 0, else
        # tap 1 (this cell, offset row)
        k2 = jnp.zeros((2, 2, 16, 4 * f), w3.dtype)
        for a in (0, 1):
            for b in (0, 1):
                g = 2 * a + b
                for dy in range(3):
                    for dx in range(3):
                        row, col = 2 * a + dy - 1, 2 * b + dx - 1
                        ty, py = (0, row + 4) if row < 0 else (1, row)
                        tx, px = (0, col + 4) if col < 0 else (1, col)
                        k2 = k2.at[ty, tx, py * 4 + px,
                                   g * f:(g + 1) * f].set(w3[dy, dx, 0])

        xp = x.reshape(n, h // 4, 4, w // 4, 4).transpose(0, 1, 3, 2, 4)
        xp = xp.reshape(n, h // 4, w // 4, 16)
        xp = jnp.pad(xp, ((0, 0), (1, 0), (1, 0), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp.astype(self.dtype), k2.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(n, h // 4, w // 4, 2, 2, f).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(n, h // 2, w // 2, f)

        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            dtype=jnp.float32, axis_name=None)(y)
        if self.act is not None:
            y = self.act(y)
        return y.astype(self.dtype)


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

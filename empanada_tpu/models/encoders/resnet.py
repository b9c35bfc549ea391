"""ResNet/ResNeXt/WideResNet encoders (flax.linen, NHWC).

Same capability as the reference's torchvision-derived encoders
(encoders/resnet.py:143-360): grayscale 1-channel input, 5-level pyramid
[p1..p5] at strides [4, 4, 8, 16, 32] (7x7 stride-2 stem + stride-2
maxpool), output_stride=16 replaces the final downsample with dilation-2
convs. ``widths`` lists the 4 stage output channel counts; the stem width
is ``w_stem`` (64).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import conv_kaiming

__all__ = [
    "ResNet", "ResNetConfig",
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "resnext50_32x4d", "resnext101_32x8d",
    "wide_resnet50_2", "wide_resnet101_2",
]


@dataclasses.dataclass
class ResNetConfig:
    layers: Sequence[int]
    block: str  # 'basic' | 'bottleneck'
    groups: int = 1
    width_per_group: int = 64
    w_stem: int = 64

    def __post_init__(self):
        expansion = 1 if self.block == "basic" else 4
        self.widths = [64 * expansion, 128 * expansion,
                       256 * expansion, 512 * expansion]


def _conv(features, kernel, stride=1, dilation=1, groups=1, dtype=jnp.float32,
          name=None):
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)],
                   kernel_dilation=(dilation, dilation),
                   feature_group_count=groups, use_bias=False, dtype=dtype,
                   kernel_init=conv_kaiming, name=name)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  dtype=jnp.float32)
        out = _conv(self.planes, 3, self.stride, self.dilation,
                    dtype=self.dtype)(x)
        out = nn.relu(bn()(out).astype(self.dtype))
        out = _conv(self.planes, 3, 1, self.dilation, dtype=self.dtype)(out)
        out = bn()(out).astype(self.dtype)
        if self.downsample:
            x = _conv(self.planes, 1, self.stride, dtype=self.dtype)(x)
            x = bn()(x).astype(self.dtype)
        return nn.relu(out + x)


class BottleneckBlock(nn.Module):
    planes: int  # base planes; output = planes * 4
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    base_width: int = 64
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  dtype=jnp.float32)
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4

        out = _conv(width, 1, dtype=self.dtype)(x)
        out = nn.relu(bn()(out).astype(self.dtype))
        out = _conv(width, 3, self.stride, self.dilation, self.groups,
                    dtype=self.dtype)(out)
        out = nn.relu(bn()(out).astype(self.dtype))
        out = _conv(out_ch, 1, dtype=self.dtype)(out)
        out = bn()(out).astype(self.dtype)
        if self.downsample:
            x = _conv(out_ch, 1, self.stride, dtype=self.dtype)(x)
            x = bn()(x).astype(self.dtype)
        return nn.relu(out + x)


class ResNet(nn.Module):
    cfg: ResNetConfig
    output_stride: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          dtype=jnp.float32)
        out = _conv(cfg.w_stem, 7, stride=2, dtype=self.dtype, name="stem")(x)
        out = nn.relu(bn(out).astype(self.dtype))
        out = nn.max_pool(out, (3, 3), strides=(2, 2),
                          padding=[(1, 1), (1, 1)])

        features = [out]  # p1 at stride 4
        planes = [64, 128, 256, 512]
        strides = [1, 2, 2, 2 if self.output_stride == 32 else 1]
        dilations = [1, 1, 1, 1 if self.output_stride == 32 else 2]
        in_ch = cfg.w_stem

        for si in range(4):
            for bi in range(cfg.layers[si]):
                stride = strides[si] if bi == 0 else 1
                if cfg.block == "basic":
                    needs_ds = bi == 0 and (stride != 1 or in_ch != planes[si])
                    out = BasicBlock(planes[si], stride, dilations[si],
                                     downsample=needs_ds, dtype=self.dtype,
                                     name=f"layer{si + 1}_block{bi + 1}")(out, train)
                    in_ch = planes[si]
                else:
                    needs_ds = bi == 0 and (stride != 1 or in_ch != planes[si] * 4)
                    out = BottleneckBlock(planes[si], stride, dilations[si],
                                          cfg.groups, cfg.width_per_group,
                                          downsample=needs_ds, dtype=self.dtype,
                                          name=f"layer{si + 1}_block{bi + 1}")(out, train)
                    in_ch = planes[si] * 4
            features.append(out)
        return features


def _mk(layers, block, **kw):
    groups = kw.pop("groups", 1)
    width_per_group = kw.pop("width_per_group", 64)
    cfg = ResNetConfig(layers=layers, block=block, groups=groups,
                       width_per_group=width_per_group)
    return ResNet(cfg=cfg, **kw)


def resnet18(**kw):
    return _mk([2, 2, 2, 2], "basic", **kw)


def resnet34(**kw):
    return _mk([3, 4, 6, 3], "basic", **kw)


def resnet50(**kw):
    return _mk([3, 4, 6, 3], "bottleneck", **kw)


def resnet101(**kw):
    return _mk([3, 4, 23, 3], "bottleneck", **kw)


def resnet152(**kw):
    return _mk([3, 8, 36, 3], "bottleneck", **kw)


def resnext50_32x4d(**kw):
    return _mk([3, 4, 6, 3], "bottleneck", groups=32, width_per_group=4, **kw)


def resnext101_32x8d(**kw):
    return _mk([3, 4, 23, 3], "bottleneck", groups=32, width_per_group=8, **kw)


def wide_resnet50_2(**kw):
    return _mk([3, 4, 6, 3], "bottleneck", width_per_group=128, **kw)


def wide_resnet101_2(**kw):
    return _mk([3, 4, 23, 3], "bottleneck", width_per_group=128, **kw)

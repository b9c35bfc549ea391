"""RegNetX/Y encoders (flax.linen, NHWC).

Same design space as the reference (encoders/regnet.py:127-316, following
arXiv 2003.13678): quantized width rules generate 4 stages of bottleneck
blocks (bottle_ratio 1) with optional squeeze-excite; stem + 4 stages give
a 5-level feature pyramid at strides [2, 4, 8, 16, 32]. The MitoNet
backbone is regnety_6p4gf (SE on).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import numpy as np
import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import (
    ConvBNAct,
    Resample2d,
    SpaceToDepthStem,
    SqueezeExcite,
)

__all__ = [
    "RegNet", "RegNetConfig",
    "regnetx_6p4gf", "regnety_200mf", "regnety_800mf", "regnety_3p2gf",
    "regnety_4gf", "regnety_6p4gf", "regnety_8gf", "regnety_16gf",
]


@dataclasses.dataclass
class RegNetConfig:
    """Quantized-width parameter generator (eqns 2-4 of arXiv 2003.13678)."""
    depth: int
    w_0: int
    w_a: float
    w_m: float
    group_w: int
    q: int = 8
    use_se: bool = False
    w_stem: int = 32
    bottle_ratio: int = 1

    def __post_init__(self):
        assert self.w_a >= 0 and self.w_0 > 0 and self.w_m > 1
        assert self.w_0 % self.q == 0

        u = self.w_0 + np.arange(self.depth) * self.w_a
        s = np.round(np.log(u / self.w_0) / np.log(self.w_m))
        w = self.w_0 * np.power(self.w_m, s)
        w = self.q * np.round(w / self.q).astype(int)
        w, d = np.unique(w, return_counts=True)
        assert len(w) == 4, "only 4-stage networks supported"

        widths, groups = [], []
        for wi in w.tolist():
            w_b = int(max(1, wi * self.bottle_ratio))
            gw = int(min(self.group_w, w_b))
            m = np.lcm(gw, self.bottle_ratio) if self.bottle_ratio > 1 else gw
            w_b = max(m, int(m * round(w_b / m)))
            widths.append(int(w_b / self.bottle_ratio))
            groups.append(w_b // gw)

        self.widths = widths
        self.depths = d.tolist()
        self.groups = groups
        self.strides = [2, 2, 2, 2]


class Bottleneck(nn.Module):
    features: int
    groups: int = 1
    stride: int = 1
    bottle_ratio: float = 1.0
    use_se: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w_b = int(round(self.features * self.bottle_ratio))
        out = ConvBNAct(w_b, 1, dtype=self.dtype)(x, train)
        out = ConvBNAct(w_b, 3, stride=self.stride, groups=self.groups,
                        dtype=self.dtype)(out, train)
        if self.use_se:
            out = SqueezeExcite(dtype=self.dtype)(out)
        out = ConvBNAct(self.features, 1, act=None, final_bn=True,
                        dtype=self.dtype)(out, train)
        identity = Resample2d(self.features, stride=self.stride,
                              dtype=self.dtype)(x, train)
        return nn.relu(identity + out)


class RegNet(nn.Module):
    """Returns 5-level pyramid [stem/2, s1/4, s2/8, s3/16, s4/32].

    output_stride=16 sets the last stage's stride to 1 (the reference does
    the same without dilation, regnet.py:140-142).
    """
    cfg: RegNetConfig
    output_stride: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.cfg
        strides = list(cfg.strides)
        if self.output_stride == 16:
            strides[-1] = 1

        # EMPANADA_S2D_STEM=1: compute the (identically-parameterized)
        # stem as a space-to-depth conv — a 1-channel 3x3 conv uses
        # 1/128 of the MXU's input lanes; the packed form feeds 16
        # (blocks.SpaceToDepthStem). Same checkpoint tree either way.
        s2d = os.environ.get("EMPANADA_S2D_STEM", "") not in ("", "0")
        if s2d and x.shape[-1] == 1 and x.shape[1] % 4 == 0 \
                and x.shape[2] % 4 == 0:
            stem = SpaceToDepthStem(cfg.w_stem, dtype=self.dtype,
                                    name="stem")(x, train)
        else:
            stem = ConvBNAct(cfg.w_stem, 3, stride=2, dtype=self.dtype,
                             name="stem")(x, train)
        features = [stem]
        out = features[0]
        for i in range(4):
            for j in range(cfg.depths[i]):
                out = Bottleneck(
                    cfg.widths[i],
                    groups=cfg.groups[i],
                    stride=strides[i] if j == 0 else 1,
                    bottle_ratio=cfg.bottle_ratio,
                    use_se=cfg.use_se,
                    dtype=self.dtype,
                    name=f"stage{i + 1}_block{j + 1}",
                )(out, train)
            features.append(out)
        return features


def _make(params, **kwargs):
    use_se = params.pop("use_se", False)
    cfg = RegNetConfig(**params, use_se=use_se)
    return RegNet(cfg=cfg, **kwargs)


def regnetx_6p4gf(**kw):
    return _make(dict(depth=17, w_0=184, w_a=60.83, w_m=2.07, group_w=56), **kw)


def regnety_200mf(**kw):
    return _make(dict(depth=13, w_0=24, w_a=36.44, w_m=2.49, group_w=8), **kw)


def regnety_800mf(**kw):
    return _make(dict(depth=14, w_0=56, w_a=38.84, w_m=2.4, group_w=16), **kw)


def regnety_3p2gf(**kw):
    return _make(dict(depth=21, w_0=80, w_a=42.63, w_m=2.66, group_w=24), **kw)


def regnety_4gf(**kw):
    return _make(dict(depth=22, w_0=96, w_a=31.41, w_m=2.24, group_w=64), **kw)


def regnety_6p4gf(**kw):
    return _make(dict(depth=25, w_0=112, w_a=33.22, w_m=2.27, group_w=72,
                      use_se=True), **kw)


def regnety_8gf(**kw):
    return _make(dict(depth=17, w_0=192, w_a=76.82, w_m=2.19, group_w=56,
                      use_se=True), **kw)


def regnety_16gf(**kw):
    return _make(dict(depth=18, w_0=200, w_a=106.23, w_m=2.48, group_w=112,
                      use_se=True), **kw)

"""BiFPN feature pyramid + ladder decoder (flax.linen, NHWC).

Parity with reference decoders/bifpn.py:17-236 (EfficientDet-style):
- P6/P7 built from P5 via 1x1 resample + maxpool downsize,
- each BiFPNLayer runs a top-down pass then a bottom-up pass with
  fast-fusion (relu-normalized) scalar weights,
- BiFPNDecoder ladders transposed-conv 2x upsamples with skip concats
  from P6..P2 and finishes with a 5x5 separable conv.
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import (
    ConvBNAct,
    ConvTransposeBNAct,
    Resample2d,
    Resize2d,
    SeparableConvBNAct,
)

__all__ = ["BiFPN", "BiFPNDecoder"]


def _fusion_weights(module: nn.Module, name: str, n: int, eps: float = 1e-4):
    w = module.param(name, nn.initializers.ones, (n,))
    w = nn.relu(w)
    return w / (jnp.sum(w) + eps)


class TopDownFPN(nn.Module):
    """Input: features smallest-resolution first. Fuses downward."""
    fpn_dim: int
    n_levels: int  # number of levels BELOW the top (levels fused)
    depthwise: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], train: bool = False):
        weights = _fusion_weights(self, "fusion_weights", self.n_levels + 1)
        resize_up = Resize2d(2, "up")
        eps = 1e-4

        # ONE shared after-combine conv for all levels of the pass —
        # the reference appends the same module instance per level
        # (reference decoders/bifpn.py:36-42)
        if self.depthwise:
            after = SeparableConvBNAct(self.fpn_dim, 3, act=nn.silu,
                                       dtype=self.dtype, name="after")
        else:
            after = ConvBNAct(self.fpn_dim, 3, dtype=self.dtype,
                              name="after")

        out = [feats[0]]
        for i in range(self.n_levels):
            high = Resample2d(self.fpn_dim, dtype=self.dtype,
                              name=f"resample_{i}")(feats[i + 1], train)
            w1, w2 = weights[i], weights[i + 1]
            fused = (w1 * resize_up(out[-1]) + w2 * high) / (w1 + w2 + eps)
            out.append(after(fused, train))
        return out


class BottomUpFPN(nn.Module):
    """Input: pyramid largest-res first (levels 1..n) plus top-down outputs."""
    fpn_dim: int
    n_levels: int
    depthwise: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid: List[jnp.ndarray],
                 top_down: List[jnp.ndarray], train: bool = False):
        weights = _fusion_weights(self, "fusion_weights", self.n_levels + 1)
        resize_down = Resize2d(2, "down")
        eps = 1e-4

        # shared after-combine conv (reference decoders/bifpn.py:92-98)
        if self.depthwise:
            after = SeparableConvBNAct(self.fpn_dim, 3, act=nn.silu,
                                       dtype=self.dtype, name="after")
        else:
            after = ConvBNAct(self.fpn_dim, 3, dtype=self.dtype,
                              name="after")

        out = [top_down[0]]
        for i in range(self.n_levels):
            pyr = Resample2d(self.fpn_dim, dtype=self.dtype,
                             name=f"resample_{i}")(pyramid[i], train)
            if i < self.n_levels - 1:
                w1, w2, w3 = weights[i], weights[i + 1], weights[i + 2]
                num = (w1 * resize_down(out[-1]) + w2 * pyr
                       + w3 * top_down[i + 1])
                den = w1 + w2 + w3 + eps
            else:
                w1, w2 = weights[i], weights[i + 1]
                num = w1 * resize_down(out[-1]) + w2 * pyr
                den = w1 + w2 + eps
            out.append(after(num / den, train))
        return out


class BiFPNLayer(nn.Module):
    fpn_dim: int
    n_scales: int
    depthwise: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid: List[jnp.ndarray], train: bool = False):
        # top-down over reversed features (smallest first)
        td = TopDownFPN(self.fpn_dim, self.n_scales - 1, self.depthwise,
                        self.dtype, name="top_down")(pyramid[::-1], train)
        # bottom-up over original order, skipping the largest (already fused)
        bu = BottomUpFPN(self.fpn_dim, self.n_scales - 1, self.depthwise,
                         self.dtype, name="bottom_up")(pyramid[1:], td[::-1],
                                                       train)
        return bu


class BiFPN(nn.Module):
    """Takes [P3, P4, P5]; internally adds P6, P7; returns 5 fused levels
    largest-resolution first."""
    fpn_dim: int = 160
    num_layers: int = 3
    depthwise: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pyramid: List[jnp.ndarray], train: bool = False):
        downsize = Resize2d(2, "down")
        p6 = downsize(Resample2d(self.fpn_dim, dtype=self.dtype,
                                 name="p6_resample")(pyramid[-1], train))
        p7 = downsize(p6)
        feats = list(pyramid) + [p6, p7]
        n_scales = len(feats)

        for li in range(self.num_layers):
            feats = BiFPNLayer(self.fpn_dim, n_scales, self.depthwise,
                               self.dtype, name=f"layer_{li}")(feats, train)
        return feats


class BiFPNDecoder(nn.Module):
    """Ladder decoder: from P7 upward, 2x transpose-conv + skip concat,
    finishing with a 5x5 separable fusion at P2 resolution."""
    fpn_dim: int = 160
    n_fpn_scales: int = 5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fpn_features: List[jnp.ndarray], train: bool = False):
        # fpn_features ordered smallest-resolution first (P7 ... P3, P2)
        assert len(fpn_features) == self.n_fpn_scales + 1
        x = fpn_features[0]
        skips = fpn_features[1:]
        for i in range(self.n_fpn_scales):
            x = ConvTransposeBNAct(self.fpn_dim, 2, dtype=self.dtype,
                                   name=f"up_{i}")(x, train)
            x = jnp.concatenate([x, skips[i].astype(x.dtype)], axis=-1)
        return SeparableConvBNAct(self.fpn_dim, 5, dtype=self.dtype,
                                  name="fusion")(x, train)

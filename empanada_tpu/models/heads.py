"""Prediction heads (flax.linen, NHWC).

Parity with reference models/heads.py:9-19: 5x5 separable conv-bn-relu
followed by a 1x1 conv with bias.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import SeparableConvBNAct, head_normal

__all__ = ["PanopticDeepLabHead"]


class PanopticDeepLabHead(nn.Module):
    n_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = SeparableConvBNAct(x.shape[-1], 5, dtype=self.dtype,
                               kernel_init=head_normal)(x, train)
        return nn.Conv(self.n_classes, (1, 1), use_bias=True,
                       dtype=self.dtype, kernel_init=head_normal)(x)

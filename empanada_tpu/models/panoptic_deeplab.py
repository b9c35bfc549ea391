"""Panoptic-DeepLab model family (flax.linen, NHWC).

Parity with reference models/panoptic_deeplab.py:20-221 and the exported
eval forward of models/quantization/panoptic_deeplab.py:194-250:

- ``PanopticDeepLab``: encoder -> semantic decoder (+ optional separate
  instance decoder width-scaled by ``ins_ratio``) -> 3 heads, all bilinearly
  upsampled 4x (align_corners=True).
- ``PanopticDeepLabPR``: PointRend refinement on the semantic head. Train
  mode emits point logits/coords for the PointRend loss; eval mode runs
  ``render_steps`` subdivision rounds and can keep ctr/offsets at 1/4 res
  (``interpolate_ins=False``) for the coarse-boundary fast path.
- ``PanopticDeepLabBC``: boundary-contour variant (semantic + contour
  heads, both PointRend-refined; no center/offset heads).

Outputs are dicts of NHWC tensors keyed like the reference
('sem_logits', 'ctr_hmp', 'offsets', ...).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.decoders.panoptic_deeplab import PanopticDeepLabDecoder
from empanada_tpu.models.encoders import get_encoder
from empanada_tpu.models.heads import PanopticDeepLabHead
from empanada_tpu.models.point_rend import PointRendSemSegHead
from empanada_tpu.ops.resize import interpolate_scale

__all__ = ["PanopticDeepLab", "PanopticDeepLabPR", "PanopticDeepLabBC"]


class PanopticDeepLab(nn.Module):
    encoder: str = "resnet50"
    num_classes: int = 1
    stage4_stride: int = 16
    decoder_channels: int = 256
    low_level_stages: Sequence[int] = (3, 2, 1)
    low_level_channels_project: Sequence[int] = (128, 64, 32)
    atrous_rates: Sequence[int] = (2, 4, 6)
    aspp_channels: Optional[int] = None
    aspp_dropout: float = 0.1
    ins_decoder: bool = False
    ins_ratio: float = 0.5
    dtype: Any = jnp.float32

    def setup(self):
        assert self.stage4_stride in (16, 32)
        self.encoder_mod = get_encoder(self.encoder,
                                       output_stride=self.stage4_stride,
                                       dtype=self.dtype)
        self.semantic_decoder = PanopticDeepLabDecoder(
            decoder_channels=self.decoder_channels,
            low_level_stages=tuple(self.low_level_stages),
            low_level_channels_project=tuple(self.low_level_channels_project),
            atrous_rates=tuple(self.atrous_rates),
            aspp_channels=self.aspp_channels,
            aspp_dropout=self.aspp_dropout,
            dtype=self.dtype,
        )
        if self.ins_decoder:
            self.instance_decoder = PanopticDeepLabDecoder(
                decoder_channels=self.decoder_channels,
                low_level_stages=tuple(self.low_level_stages),
                low_level_channels_project=tuple(
                    int(s * self.ins_ratio)
                    for s in self.low_level_channels_project),
                atrous_rates=tuple(self.atrous_rates),
                aspp_channels=self.aspp_channels,
                aspp_dropout=self.aspp_dropout,
                dtype=self.dtype,
            )
        else:
            self.instance_decoder = None

        self.semantic_head = PanopticDeepLabHead(self.num_classes,
                                                 dtype=self.dtype)
        self.ins_center = PanopticDeepLabHead(1, dtype=self.dtype)
        self.ins_xy = PanopticDeepLabHead(2, dtype=self.dtype)
        self._post_setup()

    def _post_setup(self):
        pass

    def _encode_decode(self, x, train):
        pyramid = self.encoder_mod(x, train)
        semantic_x = self.semantic_decoder(pyramid, train)
        if self.instance_decoder is not None:
            instance_x = self.instance_decoder(pyramid, train)
        else:
            instance_x = semantic_x
        return pyramid, semantic_x, instance_x

    def _apply_heads(self, semantic_x, instance_x, train, render_steps,
                     interpolate_ins):
        sem = self.semantic_head(semantic_x, train)
        ctr_hmp = self.ins_center(instance_x, train)
        offsets = self.ins_xy(instance_x, train)
        up = lambda t: interpolate_scale(t, 4, align_corners=True)
        return {
            "sem_logits": up(sem),
            "ctr_hmp": up(ctr_hmp),
            "offsets": up(offsets),
        }

    def __call__(self, x, train: bool = False, render_steps: int = 2,
                 interpolate_ins: bool = True):
        _, semantic_x, instance_x = self._encode_decode(x, train)
        return self._apply_heads(semantic_x, instance_x, train, render_steps,
                                 interpolate_ins)


class PanopticDeepLabPR(PanopticDeepLab):
    num_fc: int = 3
    train_num_points: int = 1024
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 2
    subdivision_num_points: int = 8192

    def _post_setup(self):
        self.semantic_pr = PointRendSemSegHead(
            num_classes=self.num_classes,
            num_fc=self.num_fc,
            train_num_points=self.train_num_points,
            oversample_ratio=self.oversample_ratio,
            importance_sample_ratio=self.importance_sample_ratio,
            subdivision_steps=self.subdivision_steps,
            subdivision_num_points=self.subdivision_num_points,
            dtype=self.dtype,
        )

    def _apply_heads(self, semantic_x, instance_x, train, render_steps,
                     interpolate_ins):
        sem = self.semantic_head(semantic_x, train)
        ctr_hmp = self.ins_center(instance_x, train)
        offsets = self.ins_xy(instance_x, train)
        up = lambda t: interpolate_scale(t, 4, align_corners=True)

        out = {}
        if train:
            pr_out = self.semantic_pr(sem, semantic_x, train=True)
            out["sem_logits"] = up(pr_out["sem_seg_logits"])
            out["sem_points"] = pr_out["point_logits"]
            out["point_coords"] = pr_out["point_coords"]
            out["ctr_hmp"] = up(ctr_hmp)
            out["offsets"] = up(offsets)
        else:
            pr_out = self.semantic_pr(sem, semantic_x, train=False,
                                      render_steps=render_steps)
            out["sem_logits"] = pr_out["sem_seg_logits"]
            out["ctr_hmp"] = up(ctr_hmp) if interpolate_ins else ctr_hmp
            out["offsets"] = up(offsets) if interpolate_ins else offsets
        return out


class PanopticDeepLabBC(PanopticDeepLab):
    num_fc: int = 3
    train_num_points: int = 1024
    oversample_ratio: int = 3
    importance_sample_ratio: float = 0.75
    subdivision_steps: int = 2
    subdivision_num_points: int = 8192

    def _post_setup(self):
        self.boundary_head = PanopticDeepLabHead(1, dtype=self.dtype)
        pr_kwargs = dict(
            num_fc=self.num_fc,
            train_num_points=self.train_num_points,
            oversample_ratio=self.oversample_ratio,
            importance_sample_ratio=self.importance_sample_ratio,
            subdivision_steps=self.subdivision_steps,
            subdivision_num_points=self.subdivision_num_points,
            dtype=self.dtype,
        )
        self.semantic_pr = PointRendSemSegHead(num_classes=self.num_classes,
                                               **pr_kwargs)
        self.boundary_pr = PointRendSemSegHead(num_classes=self.num_classes,
                                               **pr_kwargs)

    def _apply_heads(self, semantic_x, instance_x, train, render_steps,
                     interpolate_ins):
        sem = self.semantic_head(semantic_x, train)
        cnt = self.boundary_head(instance_x, train)
        up = lambda t: interpolate_scale(t, 4, align_corners=True)

        out = {}
        if train:
            sem_pr = self.semantic_pr(sem, semantic_x, train=True)
            cnt_pr = self.boundary_pr(cnt, instance_x, train=True)
            out["sem_logits"] = up(sem_pr["sem_seg_logits"])
            out["sem_points"] = sem_pr["point_logits"]
            out["sem_point_coords"] = sem_pr["point_coords"]
            out["cnt_logits"] = up(cnt_pr["sem_seg_logits"])
            out["cnt_points"] = cnt_pr["point_logits"]
            out["cnt_point_coords"] = cnt_pr["point_coords"]
        else:
            sem_pr = self.semantic_pr(sem, semantic_x, train=False,
                                      render_steps=render_steps)
            cnt_pr = self.boundary_pr(cnt, instance_x, train=False,
                                      render_steps=render_steps)
            out["sem_logits"] = sem_pr["sem_seg_logits"]
            out["cnt_logits"] = cnt_pr["sem_seg_logits"]
        return out

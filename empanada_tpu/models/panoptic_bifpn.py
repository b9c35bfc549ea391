"""Panoptic-BiFPN model family (flax.linen, NHWC).

Parity with reference models/panoptic_bifpn.py:22-173. MitoNet is
``PanopticBiFPNPR`` with a regnety_6p4gf backbone
(reference projects/mitonet/configs/finetune.yaml:4).

Pipeline: encoder 5-level pyramid -> p2 resampled to fpn_dim; BiFPN over
[P3, P4, P5] (adds P6/P7); BiFPNDecoder ladders [P7..P3, P2] back to 1/4
resolution; PDL heads (+ optional PointRend on the semantic head).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from empanada_tpu.models.blocks import Resample2d
from empanada_tpu.models.decoders.bifpn import BiFPN, BiFPNDecoder
from empanada_tpu.models.encoders import get_encoder
from empanada_tpu.models.heads import PanopticDeepLabHead
from empanada_tpu.models.point_rend import PointRendSemSegHead
from empanada_tpu.ops.resize import interpolate_scale

__all__ = ["PanopticBiFPN", "PanopticBiFPNPR"]


class PanopticBiFPN(nn.Module):
    encoder: str = "regnety_6p4gf"
    num_classes: int = 1
    fpn_dim: int = 160
    fpn_layers: int = 3
    ins_decoder: bool = False
    depthwise: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder_mod = get_encoder(self.encoder, dtype=self.dtype)
        self.p2_resample = Resample2d(self.fpn_dim, dtype=self.dtype)
        self.semantic_fpn = BiFPN(self.fpn_dim, self.fpn_layers,
                                  self.depthwise, dtype=self.dtype)
        self.semantic_decoder = BiFPNDecoder(self.fpn_dim, dtype=self.dtype)
        if self.ins_decoder:
            self.instance_fpn = BiFPN(self.fpn_dim, self.fpn_layers,
                                      self.depthwise, dtype=self.dtype)
            self.instance_decoder = BiFPNDecoder(self.fpn_dim,
                                                 dtype=self.dtype)
        else:
            self.instance_fpn = None
        self.semantic_head = PanopticDeepLabHead(self.num_classes,
                                                 dtype=self.dtype)
        self.ins_center = PanopticDeepLabHead(1, dtype=self.dtype)
        self.ins_xy = PanopticDeepLabHead(2, dtype=self.dtype)
        self._post_setup()

    def _post_setup(self):
        pass

    def _encode_decode(self, x, train):
        pyramid = self.encoder_mod(x, train)
        p2 = self.p2_resample(pyramid[1], train)

        semantic_pyr = self.semantic_fpn(pyramid[2:], train)
        semantic_pyr = [p2] + semantic_pyr
        semantic_x = self.semantic_decoder(semantic_pyr[::-1], train)

        if self.instance_fpn is not None:
            instance_pyr = self.instance_fpn(pyramid[2:], train)
            instance_pyr = [p2] + instance_pyr
            instance_x = self.instance_decoder(instance_pyr[::-1], train)
        else:
            instance_x = semantic_x
        return semantic_x, instance_x

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
        semantic_x, instance_x = self._encode_decode(x, train)
        return self._apply_heads(semantic_x, instance_x, train, render_steps,
                                 interpolate_ins)


class PanopticBiFPNPR(PanopticBiFPN):
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

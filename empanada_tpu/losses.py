"""Training losses (pure JAX functions, NHWC).

Parity with reference losses.py:14-197:

- ``bootstrap_ce``: (binary) cross-entropy averaging only the top-k%% of
  per-pixel losses. top_k count is shape-static so the whole loss jits.
- ``heatmap_mse``: plain MSE on center heatmaps.
- ``offset_l1``: L1 on offsets masked to the GT foreground.
- ``pointrend_loss``: CE between point logits and nearest-sampled GT at the
  PointRend-chosen coordinates.
- ``PanopticLoss`` / ``BCLoss``: weighted composites returning
  (total, aux dict). Default weights match the reference exactly
  (ce=1, mse=200, l1=0.01, pr=1, top_k=0.2 / 0.15).

Losses return traced scalars; callers jit the whole (loss o model) step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from empanada_tpu.ops.sampling import point_sample

__all__ = [
    "bootstrap_ce",
    "heatmap_mse",
    "offset_l1",
    "pointrend_loss",
    "PanopticLoss",
    "BCLoss",
    "LOSSES",
    "create_loss",
]


def _pixel_ce(logits, labels):
    """Per-pixel (binary) cross-entropy. logits (N,H,W,C); labels (N,H,W)."""
    if logits.shape[-1] == 1:
        return optax.sigmoid_binary_cross_entropy(
            logits[..., 0], labels.astype(logits.dtype))
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, labels.astype(jnp.int32))


def bootstrap_ce(logits, labels, top_k_percent_pixels=0.2):
    """Bootstrapped CE (reference losses.py:14-46)."""
    pixel_losses = _pixel_ce(logits, labels).reshape(-1)
    if top_k_percent_pixels >= 1.0:
        return pixel_losses.mean()
    k = max(1, int(top_k_percent_pixels * pixel_losses.size))
    top, _ = jax.lax.top_k(pixel_losses, k)
    return top.mean()


def heatmap_mse(output, target):
    """MSE on center heatmaps (reference losses.py:48-57)."""
    return jnp.mean(jnp.square(output - target))


def offset_l1(output, target, offset_weights):
    """Masked L1 on offsets (reference losses.py:59-75). weights (N,H,W,1)."""
    l1 = jnp.abs(output - target) * offset_weights
    weight_sum = offset_weights.sum()
    return jnp.where(weight_sum == 0, 0.0, l1.sum() / jnp.maximum(weight_sum, 1))


def pointrend_loss(point_logits, point_coords, labels):
    """CE at sampled points (reference losses.py:77-99).

    point_logits: (N, P, C); point_coords: (N, P, 2) in [0,1] (x, y);
    labels: (N, H, W) int.
    """
    point_labels = point_sample(
        labels[..., None].astype(jnp.float32), point_coords, mode="nearest")
    if point_logits.shape[-1] == 1:
        return optax.sigmoid_binary_cross_entropy(
            point_logits, point_labels).mean()
    return optax.softmax_cross_entropy_with_integer_labels(
        point_logits, point_labels[..., 0].astype(jnp.int32)).mean()


class PanopticLoss:
    """Weighted semantic + center + offset (+ PointRend) loss
    (reference losses.py:101-155). Returns (total, aux)."""

    def __init__(self, ce_weight=1.0, mse_weight=200.0, l1_weight=0.01,
                 pr_weight=1.0, top_k_percent=0.2, **kwargs):
        self.ce_weight = ce_weight
        self.mse_weight = mse_weight
        self.l1_weight = l1_weight
        self.pr_weight = pr_weight
        self.top_k_percent = top_k_percent

    def __call__(self, output, target):
        mse = heatmap_mse(output["ctr_hmp"], target["ctr_hmp"])
        ce = bootstrap_ce(output["sem_logits"], target["sem"],
                          self.top_k_percent)
        offset_weights = (target["sem"] > 0)[..., None].astype(jnp.float32)
        l1 = offset_l1(output["offsets"], target["offsets"], offset_weights)

        aux = {"ce": ce, "l1": l1, "mse": mse}
        total = self.ce_weight * ce + self.mse_weight * mse \
            + self.l1_weight * l1

        if "sem_points" in output:
            pr_ce = pointrend_loss(output["sem_points"],
                                   output["point_coords"], target["sem"])
            aux["pointrend_ce"] = pr_ce
            total = total + self.pr_weight * pr_ce

        aux["total_loss"] = total
        return total, aux


class BCLoss:
    """Boundary-contour composite loss (reference losses.py:157-197)."""

    def __init__(self, pr_weight=1.0, top_k_percent=0.15, **kwargs):
        self.pr_weight = pr_weight
        self.top_k_percent = top_k_percent

    def __call__(self, output, target):
        sem_ce = bootstrap_ce(output["sem_logits"], target["sem"],
                              self.top_k_percent)
        cnt_ce = bootstrap_ce(output["cnt_logits"], target["cnt"],
                              self.top_k_percent)
        aux = {"sem_ce": sem_ce, "cnt_ce": cnt_ce}
        total = sem_ce + cnt_ce

        if "sem_points" in output:
            sem_pr = pointrend_loss(output["sem_points"],
                                    output["sem_point_coords"], target["sem"])
            cnt_pr = pointrend_loss(output["cnt_points"],
                                    output["cnt_point_coords"], target["cnt"])
            aux["sem_pr_ce"] = sem_pr
            aux["cnt_pr_ce"] = cnt_pr
            total = total + self.pr_weight * (sem_pr + cnt_pr)

        aux["total_loss"] = total
        return total, aux


LOSSES = {"PanopticLoss": PanopticLoss, "BCLoss": BCLoss}


def create_loss(name, **kwargs):
    if name not in LOSSES:
        raise ValueError(f"unknown loss {name!r}; choices: {sorted(LOSSES)}")
    return LOSSES[name](**kwargs)

"""Inference engines: model forward + fused on-device panoptic postprocess.

Functional parity with reference inference/engines.py:32-480, redesigned for
the XLA compilation model:

- The model forward, median filtering, center NMS, pixel grouping, and
  panoptic merge are each jit-compiled once per (shape, flags) and run
  entirely on device; the median "queue" is a host-side deque of
  *device-resident* arrays so no intermediate output ever crosses to host.
- ``__call__`` returns the panoptic map as a device array; callers either
  pull compact run buffers (ops/rle_device.extract_runs) or np.asarray it.
- The reference postprocesses with dynamic #centers; here instance ids live
  in a fixed ``max_centers`` budget (see ops/postprocess.py).

Engine semantics preserved exactly (reference engines.py):
- `_MedianQueue.get_next` (engines.py:68-84): while the queue holds <= mid
  items return the newest un-smoothed output; while building past mid
  return None; when full return the middle item with median-filtered
  probability maps.
- Render engines (engines.py:223-394): factor-pad input, infer with
  ``render_steps = 2 + log2(upsampling)``, group pixels on the 1/4-res
  grid when ``coarse_boundaries`` (step=4) and nearest-upsample the
  instance cells by ``upsampling * step``.
- BC engines (engines.py:396-480): sigmoid semantic + contour maps stacked
  channel-last, median filtered as one tensor.
"""

from __future__ import annotations

import math
from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from empanada_tpu.ops.postprocess import (
    _class_select,
    find_instance_centers,
    group_pixels,
    harden_semantic,
    logits_to_prob,
    merge_semantic_and_instance,
)
from empanada_tpu.ops.resize import factor_pad

__all__ = [
    "JittedModel",
    "PanopticDeepLabEngine",
    "PanopticDeepLabEngine3d",
    "PanopticDeepLabRenderEngine",
    "PanopticDeepLabRenderEngine3d",
    "BCEngine",
    "BCEngine3d",
    "ENGINES",
    "create_engine",
]


class JittedModel:
    """Binds a flax module + params into a jit-cached eval-mode callable.

    ``model(image, render_steps, interpolate_ins) -> dict[str, jax.Array]``
    — the same callable contract the reference's exported TorchScript
    models have (reference quantization/panoptic_deeplab.py:238-250).
    """

    def __init__(self, module, params):
        self.module = module
        self.params = params
        self._cache = {}

    def _fn(self, render_steps: int, interpolate_ins: bool):
        key = (render_steps, interpolate_ins)
        if key not in self._cache:
            def fwd(params, image):
                return self.module.apply(
                    params, image, train=False, render_steps=render_steps,
                    interpolate_ins=interpolate_ins)
            self._cache[key] = jax.jit(fwd)
        return self._cache[key]

    def __call__(self, image, render_steps: int = 2,
                 interpolate_ins: bool = True):
        return self._fn(render_steps, interpolate_ins)(self.params, image)


def _as_nhwc(image) -> jax.Array:
    """Accept (H, W), (H, W, C) or (N, H, W, C); return (1, H, W, C)."""
    image = jnp.asarray(image)
    if image.ndim == 2:
        image = image[None, :, :, None]
    elif image.ndim == 3:
        image = image[None]
    assert image.ndim == 4 and image.shape[0] == 1, \
        "engines are single-image (batch size 1), like the reference"
    return image


# --------------------------------------------------------------------------
# fused device postprocess kernels (jit per shape)
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=(
    "label_divisor", "stuff_area", "void_label", "nms_threshold",
    "nms_kernel", "confidence_thr", "max_centers", "num_classes"))
def _fused_panoptic(sem_prob, ctr_hmp, offsets, thing_table, *,
                    label_divisor, stuff_area, void_label, nms_threshold,
                    nms_kernel, confidence_thr, max_centers, num_classes):
    """harden + NMS + grouping + merge for same-resolution maps
    (reference PanopticDeepLabEngine.postprocess, engines.py:133-139)."""
    sem = harden_semantic(sem_prob, confidence_thr)
    centers, valid = find_instance_centers(
        ctr_hmp, nms_threshold, nms_kernel, max_centers)
    ins = group_pixels(centers, valid, offsets)
    ins = jnp.where(jnp.any(valid), ins, 0)
    ins = jnp.where(_class_select(thing_table, sem, num_classes), ins, 0)
    return merge_semantic_and_instance(
        sem, ins, label_divisor, thing_table, stuff_area, void_label,
        max_centers, num_classes)


@partial(jax.jit, static_argnames=(
    "nms_threshold", "nms_kernel", "max_centers", "step", "scale"))
def _instance_cells(ctr_hmp, offsets, *, nms_threshold, nms_kernel,
                    max_centers, step, scale):
    """Center NMS + pixel grouping on the (possibly 1/4-res) grid, then
    nearest-upsample ids by ``scale`` (reference engines.py:258-275)."""
    centers, valid = find_instance_centers(
        ctr_hmp, nms_threshold, nms_kernel, max_centers)
    ins = group_pixels(centers, valid, offsets, step=float(step))
    ins = jnp.where(jnp.any(valid), ins, 0)
    if scale > 1:
        ins = jnp.repeat(jnp.repeat(ins, scale, axis=0), scale, axis=1)
    return ins


@partial(jax.jit, static_argnames=(
    "label_divisor", "stuff_area", "void_label", "confidence_thr",
    "max_centers", "num_classes"))
def _merge_with_cells(sem_prob, instance_cells, thing_table, *,
                      label_divisor, stuff_area, void_label, confidence_thr,
                      max_centers, num_classes):
    """harden + restrict cells to thing pixels + merge
    (reference PanopticDeepLabRenderEngine.get_panoptic_seg,
    engines.py:278-298)."""
    sem = harden_semantic(sem_prob, confidence_thr)
    ins = jnp.where(_class_select(thing_table, sem, num_classes),
                    instance_cells, 0)
    return merge_semantic_and_instance(
        sem, ins, label_divisor, thing_table, stuff_area, void_label,
        max_centers, num_classes)


@jax.jit
def _median_stack(window):
    """(K, H, W, C) -> (H, W, C) elementwise median over the window axis
    (sorting network — jnp.median's sort is pathologically slow on TPU)."""
    from empanada_tpu.ops.postprocess import median_small

    return median_small(window, axis=0)


class _MedianQueue:
    """Sliding median window of device-resident model outputs
    (reference engines.py:47-90)."""

    def __init__(self, median_kernel_size: int):
        assert median_kernel_size % 2 == 1, "Kernel size must be odd integer!"
        self.ks = median_kernel_size
        self.mid_idx = (median_kernel_size - 1) // 2
        self.median_queue = deque(maxlen=median_kernel_size)

    def reset(self):
        self.median_queue = deque(maxlen=self.ks)

    def enqueue(self, item):
        self.median_queue.append(item)

    def get_median(self, key):
        window = jnp.stack([out[key] for out in self.median_queue])
        return _median_stack(window)

    def get_next(self, keys):
        nq = len(self.median_queue)
        if nq <= self.mid_idx:
            return self.median_queue[-1]
        if nq < self.ks:
            return None
        output = dict(self.median_queue[self.mid_idx])
        for key in keys:
            output[key] = self.get_median(key)
        return output

    def remaining(self):
        return list(self.median_queue)[self.mid_idx + 1:]


# --------------------------------------------------------------------------
# engines
# --------------------------------------------------------------------------

class PanopticDeepLabEngine:
    """2D engine: infer -> probabilities -> fused panoptic postprocess
    (reference engines.py:92-159)."""

    def __init__(self, model, thing_list, label_divisor=1000, stuff_area=64,
                 void_label=0, nms_threshold=0.1, nms_kernel=7,
                 confidence_thr=0.5, max_centers=256,
                 num_classes=None, **kwargs):
        self.model = model
        self.thing_list = list(thing_list)
        self.label_divisor = label_divisor
        self.stuff_area = stuff_area
        self.void_label = void_label
        self.nms_threshold = nms_threshold
        self.nms_kernel = nms_kernel
        self.confidence_thr = confidence_thr
        self.max_centers = max_centers
        self._num_classes = num_classes
        self._thing_table = None

    def _resolve_classes(self, sem_prob):
        if self._num_classes is None:
            self._num_classes = max(
                int(sem_prob.shape[-1]),
                (max(self.thing_list) + 1) if self.thing_list else 1, 2)
        if self._thing_table is None:
            table = np.zeros((self._num_classes,), bool)
            for t in self.thing_list:
                table[t] = True
            self._thing_table = jnp.asarray(table)
        return self._num_classes, self._thing_table

    def infer(self, image):
        model_out = dict(self.model(image))
        model_out["sem"] = logits_to_prob(model_out["sem_logits"])
        return model_out

    def postprocess(self, sem_prob, ctr_hmp, offsets):
        num_classes, thing_table = self._resolve_classes(sem_prob)
        return _fused_panoptic(
            sem_prob[0], ctr_hmp[0], offsets[0], thing_table,
            label_divisor=self.label_divisor, stuff_area=self.stuff_area,
            void_label=self.void_label, nms_threshold=self.nms_threshold,
            nms_kernel=self.nms_kernel, confidence_thr=self.confidence_thr,
            max_centers=self.max_centers, num_classes=num_classes)

    def __call__(self, image):
        image = _as_nhwc(image)
        out = self.infer(image)
        return self.postprocess(out["sem"], out["ctr_hmp"], out["offsets"])


class PanopticDeepLabEngine3d(PanopticDeepLabEngine):
    """Adds the z-median window (reference engines.py:161-221)."""

    def __init__(self, *args, median_kernel_size=3, **kwargs):
        super().__init__(*args, **kwargs)
        self.queue = _MedianQueue(median_kernel_size)

    def end(self):
        return [
            self.postprocess(o["sem"], o["ctr_hmp"], o["offsets"])
            for o in self.queue.remaining()
        ]

    def __call__(self, image):
        image = _as_nhwc(image)
        out = self.infer(image)
        self.queue.enqueue(out)
        median_out = self.queue.get_next(keys=["sem"])
        if median_out is None:
            return None
        return self.postprocess(
            median_out["sem"], median_out["ctr_hmp"], median_out["offsets"])


class PanopticDeepLabRenderEngine(PanopticDeepLabEngine):
    """PointRend engine (reference engines.py:223-325): factor-pad, infer
    with render_steps = 2 + log2(upsampling), group pixels on the coarse
    grid, merge at full resolution."""

    def __init__(self, model, thing_list, padding_factor=16,
                 coarse_boundaries=True, **kwargs):
        super().__init__(model, thing_list, **kwargs)
        self.padding_factor = padding_factor
        self.coarse_boundaries = coarse_boundaries

    def infer(self, image, render_steps=2):
        model_out = dict(self.model(
            image, render_steps, interpolate_ins=not self.coarse_boundaries))
        model_out["sem"] = logits_to_prob(model_out["sem_logits"])
        return model_out

    def get_instance_cells(self, ctr_hmp, offsets, upsampling=1):
        step = 4 if self.coarse_boundaries else 1
        return _instance_cells(
            ctr_hmp[0], offsets[0], nms_threshold=self.nms_threshold,
            nms_kernel=self.nms_kernel, max_centers=self.max_centers,
            step=step, scale=int(upsampling * step))

    def get_panoptic_seg(self, sem_prob, instance_cells):
        num_classes, thing_table = self._resolve_classes(sem_prob)
        return _merge_with_cells(
            sem_prob[0], instance_cells, thing_table,
            label_divisor=self.label_divisor, stuff_area=self.stuff_area,
            void_label=self.void_label, confidence_thr=self.confidence_thr,
            max_centers=self.max_centers, num_classes=num_classes)

    def _finalize(self, model_out, upsampling, size):
        h, w = size
        cells = self.get_instance_cells(
            model_out["ctr_hmp"], model_out["offsets"], upsampling)
        pan = self.get_panoptic_seg(model_out["sem"], cells)
        return pan[:h, :w]

    def __call__(self, image, size, upsampling=1):
        assert math.log2(upsampling).is_integer(), \
            "Upsampling factor not log base 2!"
        image = _as_nhwc(image)
        image, _ = factor_pad(image, self.padding_factor)
        out = self.infer(image, int(2 + math.log2(upsampling)))
        return self._finalize(out, upsampling, size)


class PanopticDeepLabRenderEngine3d(PanopticDeepLabRenderEngine):
    """The production 3D engine (reference engines.py:327-394)."""

    def __init__(self, *args, median_kernel_size=3, **kwargs):
        super().__init__(*args, **kwargs)
        self.queue = _MedianQueue(median_kernel_size)

    def end(self, upsampling=1):
        return [
            self._finalize(o, upsampling, o["size"])
            for o in self.queue.remaining()
        ]

    def __call__(self, image, size, upsampling=1):
        assert math.log2(upsampling).is_integer(), \
            "Upsampling factor not log base 2!"
        image = _as_nhwc(image)
        image, _ = factor_pad(image, self.padding_factor)
        out = self.infer(image, int(2 + math.log2(upsampling)))
        out["size"] = size
        self.queue.enqueue(out)
        median_out = self.queue.get_next(keys=["sem"])
        if median_out is None:
            return None
        return self._finalize(median_out, upsampling, size)


class BCEngine:
    """Boundary-contour engine: sigmoid sem + cnt maps stacked channel-last
    -> (1, H, W, 2) (reference engines.py:396-416; reference layout is
    (1, 2, H, W))."""

    def __init__(self, model, **kwargs):
        self.model = model

    def infer(self, image):
        out = self.model(image)
        assert out["sem_logits"].shape[-1] == 1, "BC only works for binary"
        sem = jax.nn.sigmoid(out["sem_logits"])
        cnt = jax.nn.sigmoid(out["cnt_logits"])
        return {"bc": jnp.concatenate([sem, cnt], axis=-1)}

    def __call__(self, image):
        return self.infer(_as_nhwc(image))["bc"]


class BCEngine3d(BCEngine):
    """BC engine with median window + factor padding
    (reference engines.py:418-480)."""

    def __init__(self, model, median_kernel_size=3, padding_factor=16,
                 **kwargs):
        super().__init__(model)
        self.padding_factor = padding_factor
        self.queue = _MedianQueue(median_kernel_size)

    def infer(self, image, render_steps=2):
        out = self.model(image, render_steps)
        assert out["sem_logits"].shape[-1] == 1, "BC only works for binary"
        sem = jax.nn.sigmoid(out["sem_logits"])
        cnt = jax.nn.sigmoid(out["cnt_logits"])
        return {"bc": jnp.concatenate([sem, cnt], axis=-1)}

    def end(self, upsampling=1):
        return [
            o["bc"][:, :o["size"][0], :o["size"][1]]
            for o in self.queue.remaining()
        ]

    def __call__(self, image, size, upsampling=1):
        assert math.log2(upsampling).is_integer(), \
            "Upsampling factor not log base 2!"
        h, w = size
        image = _as_nhwc(image)
        image, _ = factor_pad(image, self.padding_factor)
        out = self.infer(image, int(2 + math.log2(upsampling)))
        out["size"] = size
        self.queue.enqueue(out)
        median_out = self.queue.get_next(keys=["bc"])
        if median_out is None:
            return None
        return median_out["bc"][:, :h, :w]


ENGINES = {
    "PanopticDeepLabEngine": PanopticDeepLabEngine,
    "PanopticDeepLabEngine3d": PanopticDeepLabEngine3d,
    "PanopticDeepLabRenderEngine": PanopticDeepLabRenderEngine,
    "PanopticDeepLabRenderEngine3d": PanopticDeepLabRenderEngine3d,
    "BCEngine": BCEngine,
    "BCEngine3d": BCEngine3d,
}


def create_engine(name, model, **kwargs):
    """Registry lookup matching the reference's config-by-name engines
    (reference scripts, EVAL.engine key)."""
    if name not in ENGINES:
        raise ValueError(f"unknown engine {name!r}; choices: {sorted(ENGINES)}")
    return ENGINES[name](model, **kwargs)

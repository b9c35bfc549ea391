"""Slice-parallel 3D inference over a device mesh.

The TPU-native redesign of the reference's multi-GPU inference
(reference scripts/inference3d_multigpu.py + patterns.forward_multigpu,
patterns.py:279-350): instead of replicating the model in N processes and
all-gathering pickled tensors, ONE jitted forward runs over a batch of N
z-slices sharded across the mesh (model replicated, batch split — XLA
moves activations over ICI, no NCCL/gloo analog needed). The cheap
sequential tail (median window, panoptic merge, run extraction) consumes
the batched outputs slice by slice in z order, preserving the exact
median/matching semantics of the single-device engine.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from empanada_tpu.inference.engines import (
    _instance_cells,
    _MedianQueue,
    _merge_with_cells,
    logits_to_prob,
)
from empanada_tpu.ops.resize import factor_pad
from empanada_tpu.parallel.mesh import batch_sharding, replicated_sharding

__all__ = ["SliceParallelEngine3d"]


class SliceParallelEngine3d:
    """Batched render engine: same contract as
    PanopticDeepLabRenderEngine3d but ``infer_stack`` consumes a whole
    VolumeDataset and yields (index, pan_seg) in z order, with the model
    forward batched over ``mesh.size`` slices."""

    def __init__(self, module, variables, mesh, thing_list,
                 label_divisor=1000, stuff_area=64, void_label=0,
                 nms_threshold=0.1, nms_kernel=7, confidence_thr=0.5,
                 median_kernel_size=3, padding_factor=16,
                 coarse_boundaries=True, max_centers=256, num_classes=None):
        self.module = module
        self.mesh = mesh
        self.thing_list = list(thing_list)
        self.label_divisor = label_divisor
        self.stuff_area = stuff_area
        self.void_label = void_label
        self.nms_threshold = nms_threshold
        self.nms_kernel = nms_kernel
        self.confidence_thr = confidence_thr
        self.padding_factor = padding_factor
        self.coarse_boundaries = coarse_boundaries
        self.max_centers = max_centers
        self.queue = _MedianQueue(median_kernel_size)

        self._num_classes = num_classes
        self._thing_table = None
        self._fwd = None

        rep = replicated_sharding(mesh)
        self.variables = jax.device_put(variables, rep)
        self._batch_sharding = batch_sharding(mesh)

    def _resolve(self, sem_prob):
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

    def _forward(self, images, render_steps):
        """images: (B, H, W, 1) host array; B == mesh.size."""
        if self._fwd is None:
            module = self.module
            ins = not self.coarse_boundaries

            def fwd(variables, image):
                out = module.apply(variables, image, train=False,
                                   render_steps=render_steps,
                                   interpolate_ins=ins)
                out["sem"] = logits_to_prob(out["sem_logits"])
                return out

            self._fwd = jax.jit(fwd)
        images = jax.device_put(images, self._batch_sharding)
        return self._fwd(self.variables, images)

    def _postprocess_one(self, out, upsampling):
        step = 4 if self.coarse_boundaries else 1
        cells = _instance_cells(
            out["ctr_hmp"][0], out["offsets"][0],
            nms_threshold=self.nms_threshold, nms_kernel=self.nms_kernel,
            max_centers=self.max_centers, step=step,
            scale=int(upsampling * step))
        num_classes, table = self._resolve(out["sem"])
        pan = _merge_with_cells(
            out["sem"][0], cells, table, label_divisor=self.label_divisor,
            stuff_area=self.stuff_area, void_label=self.void_label,
            confidence_thr=self.confidence_thr,
            max_centers=self.max_centers, num_classes=num_classes)
        h, w = out["size"]
        return pan[:h, :w]

    def infer_stack(self, dataset, upsampling=1):
        """Yield (index, pan_seg device array) in z order."""
        import math

        assert math.log2(upsampling).is_integer()
        render_steps = int(2 + math.log2(upsampling))
        b = self.mesh.size
        n = len(dataset)
        self.queue.reset()
        emitted = 0

        for block_start in range(0, n, b):
            idxs = list(range(block_start, min(block_start + b, n)))
            pad_count = b - len(idxs)
            examples = [dataset[i] for i in idxs]
            images = np.stack([
                np.asarray(ex["image"], np.float32)[..., None]
                for ex in examples
            ] + [np.zeros_like(
                np.asarray(examples[0]["image"], np.float32)[..., None])
            ] * pad_count)
            images, _ = factor_pad(images, self.padding_factor)
            out = self._forward(np.asarray(images), render_steps)

            for j, ex in enumerate(examples):
                slice_out = {
                    "sem": out["sem"][j:j + 1],
                    "ctr_hmp": out["ctr_hmp"][j:j + 1],
                    "offsets": out["offsets"][j:j + 1],
                    "size": ex["size"],
                }
                self.queue.enqueue(slice_out)
                median_out = self.queue.get_next(keys=["sem"])
                if median_out is not None:
                    yield emitted, self._postprocess_one(
                        median_out, upsampling)
                    emitted += 1

        for slice_out in self.queue.remaining():
            yield emitted, self._postprocess_one(slice_out, upsampling)
            emitted += 1


# NOTE: for production multi-chip throughput prefer
# inference.fused.FusedStackEngine(mesh=...) — one fused dispatch and one
# packed D2H per block. SliceParallelEngine3d keeps the reference's
# engine-per-slice surface (useful for debugging / API parity).

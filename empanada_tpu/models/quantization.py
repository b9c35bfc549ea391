"""Executing INT8 inference (post-training static quantization).

Reference parity: the reference exports a *genuinely quantized* fbgemm
model for CPU deployment — per-architecture ``Quantizable*`` rewrites with
QuantStub observers, calibrated on real data, converted so convolutions
execute in int8 (reference empanada/models/quantization/panoptic_deeplab.py
:170-250, scripts/export_model.py:137-163).

TPU-native counterpart, no per-architecture rewrite needed:

- **weights**: per-output-channel symmetric int8 (the existing
  ``export.quantize_variables_int8`` artifact format);
- **activations**: per-tensor symmetric int8, scales calibrated by running
  the fp32 model on sample data (``calibrate_activations``) — the analog of
  fbgemm's observer/convert flow;
- **compute**: ``lax.conv_general_dilated(int8, int8,
  preferred_element_type=int32)`` / int8 ``dot_general`` — the MXU's
  native int8 path (2x bf16 throughput on v5e-class chips; on CPU XLA
  lowers to integer convolution).

Mechanism: a flax *method interceptor* (``nn.intercept_methods``) swaps
every ``nn.Conv`` / ``nn.Dense`` ``__call__`` whose kernel is int8 in the
loaded artifact for the quantized kernel at apply/trace time. This is
model-agnostic — any architecture in the registry quantizes without a
parallel Quantizable* module tree. Everything between the matmuls
(BatchNorm inference affine, resizes, NMS) stays fp32, mirroring the
reference's DeQuantStub boundaries.
"""

from __future__ import annotations

from collections.abc import Mapping

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

__all__ = ["calibrate_activations", "Int8Module", "int8_conv_count"]


def _canon(v, n):
    """Normalize a flax Conv stride/dilation attribute to an n-tuple
    (flax accepts None / int / sequence)."""
    if v is None:
        return (1,) * n
    if isinstance(v, int):
        return (v,) * n
    return tuple(v)


def _canon_padding(padding, n):
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * n
    out = []
    for p in padding:
        out.append((p, p) if isinstance(p, int) else tuple(p))
    return out


def _get_params(mod):
    v = mod.variables
    return v.get("params", {}) if isinstance(v, Mapping) else {}


def _int8_kernel(params):
    """Return (int8 kernel, per-out-channel scale) if this module's kernel
    is stored in the quantized artifact layout, else None."""
    k = params.get("kernel")
    if isinstance(k, Mapping) and "__int8__" in k and "__scale__" in k:
        return k["__int8__"], k["__scale__"]
    return None


def _quantize_act(x, scale):
    xf = x.astype(jnp.float32)
    return jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)


def _quant_interceptor(act_scales):
    """Interceptor replacing Conv/Dense fp compute with int8 compute."""

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name != "__call__" or not isinstance(
                mod, (nn.Conv, nn.Dense)):
            return next_fun(*args, **kwargs)
        path = "/".join(mod.path)
        scale = act_scales.get(path)
        params = _get_params(mod)
        kq = _int8_kernel(params)
        if scale is None or scale <= 0 or kq is None:
            return next_fun(*args, **kwargs)
        w8, ws = kq
        x = args[0]
        orig_dtype = x.dtype
        xq = _quantize_act(x, scale)
        ws = jnp.asarray(ws, jnp.float32)

        if isinstance(mod, nn.Dense):
            y = lax.dot_general(
                xq, w8, (((x.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * (scale * ws.reshape(-1))
        else:
            n = w8.ndim - 2
            assert n == 2, "int8 path covers 2D convs (all models here)"
            y = lax.conv_general_dilated(
                xq, w8,
                window_strides=_canon(mod.strides, n),
                padding=_canon_padding(mod.padding, n),
                lhs_dilation=_canon(mod.input_dilation, n),
                rhs_dilation=_canon(mod.kernel_dilation, n),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=mod.feature_group_count,
                preferred_element_type=jnp.int32)
            # ws keeps its keepdims shape (1, 1, 1, out) -> broadcasts
            y = y.astype(jnp.float32) * (scale * ws.reshape(
                (1,) * (y.ndim - 1) + (-1,)))
        if mod.use_bias and "bias" in params:
            b = jnp.asarray(params["bias"], jnp.float32)
            y = y + b.reshape((1,) * (y.ndim - 1) + (-1,))
        return y.astype(orig_dtype)

    return interceptor


def calibrate_activations(module, variables, batches, percentile=99.99,
                          apply_kwargs=None):
    """Run the fp32 model on ``batches`` (iterable of input arrays) and
    record per-Conv/Dense input ranges -> {module_path: act_scale}.

    The analog of the reference's fbgemm observer calibration
    (scripts/export_model.py:150-156: forward passes over calibration
    images between prepare() and convert()). Runs eagerly (un-jitted) so
    the interceptor sees concrete values. ``percentile`` clips activation
    outliers (fbgemm HistogramObserver analog); 100.0 = exact max-abs.
    """
    apply_kwargs = dict(apply_kwargs or {})
    apply_kwargs.setdefault("train", False)
    records = {}

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (context.method_name == "__call__"
                and isinstance(mod, (nn.Conv, nn.Dense))):
            path = "/".join(mod.path)
            a = jnp.abs(args[0].astype(jnp.float32)).reshape(-1)
            if percentile >= 100.0:
                records.setdefault(path, []).append(
                    np.asarray([float(jnp.max(a))], np.float32))
            else:
                # keep a bounded per-batch abs sample so the percentile
                # is taken over the POOLED calibration data — a max of
                # per-batch percentiles converges to the global max as
                # batches grow, defeating the outlier clipping
                stride = max(1, a.shape[0] // 65536)
                records.setdefault(path, []).append(
                    np.asarray(a[::stride], np.float32))
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        for batch in batches:
            module.apply(variables, jnp.asarray(batch), **apply_kwargs)

    scales = {}
    for path, samples in records.items():
        pooled = np.concatenate(samples)
        m = float(np.max(pooled)) if percentile >= 100.0 \
            else float(np.percentile(pooled, percentile))
        if m > 0:
            scales[path] = m / 127.0
    return scales


class Int8Module:
    """Wrap a flax module so ``apply`` executes int8 convs/matmuls.

    Drop-in for the fp32 module anywhere the framework takes one
    (JittedModel, FusedStackEngine, SliceParallelEngine3d): attribute
    access forwards to the wrapped module; ``apply`` enters the quantizing
    interceptor. ``variables`` passed to apply must be in the int8 artifact
    layout (export.quantize_variables_int8). The callable contract matches
    the reference's converted fbgemm model (quantization/panoptic_deeplab
    .py:238-250: quantized forward, fp32 in / fp32 out).
    """

    def __init__(self, module, act_scales):
        self.module = module
        self.act_scales = {k: float(v) for k, v in dict(act_scales).items()}

    def apply(self, variables, *args, **kwargs):
        with nn.intercept_methods(_quant_interceptor(self.act_scales)):
            return self.module.apply(variables, *args, **kwargs)

    def __getattr__(self, name):
        if name in ("module", "act_scales"):
            raise AttributeError(name)
        return getattr(object.__getattribute__(self, "module"), name)


def int8_conv_count(fn, *example_args):
    """Count conv/dot equations executing on int8 operands in the jaxpr of
    ``fn(*example_args)`` — lets tests assert int8 compute actually runs
    (not just int8 storage)."""
    jaxpr = jax.make_jaxpr(fn)(*example_args)

    count = 0

    def walk(jx):
        nonlocal count
        for eqn in jx.eqns:
            if eqn.primitive.name in ("conv_general_dilated", "dot_general"):
                if any(getattr(v.aval, "dtype", None) == np.dtype(np.int8)
                       for v in eqn.invars):
                    count += 1
            for val in eqn.params.values():
                if hasattr(val, "jaxpr"):
                    walk(val.jaxpr)
                elif hasattr(val, "eqns"):
                    walk(val)
                elif isinstance(val, (list, tuple)):
                    for item in val:
                        if hasattr(item, "jaxpr"):
                            walk(item.jaxpr)
                        elif hasattr(item, "eqns"):
                            walk(item)

    walk(jaxpr.jaxpr)
    return count

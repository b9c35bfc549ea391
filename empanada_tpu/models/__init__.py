"""Model registry (config arch strings -> module factories).

Names match the reference's registry-by-reflection convention
(reference scripts/train.py:33-62) so configs are interchangeable.
"""

import jax.numpy as jnp

from empanada_tpu.models.panoptic_deeplab import (
    PanopticDeepLab,
    PanopticDeepLabPR,
    PanopticDeepLabBC,
)
from empanada_tpu.models.panoptic_bifpn import PanopticBiFPN, PanopticBiFPNPR

MODELS = {
    "PanopticDeepLab": PanopticDeepLab,
    "PanopticDeepLabPR": PanopticDeepLabPR,
    "PanopticDeepLabBC": PanopticDeepLabBC,
    "PanopticBiFPN": PanopticBiFPN,
    "PanopticBiFPNPR": PanopticBiFPNPR,
    # quantizable aliases: the reference keeps a parallel "Quantizable*"
    # model tree for CPU int8 export (models/quantization/*); here ANY
    # registry model quantizes to executing int8 via the model-agnostic
    # interceptor (models/quantization.py), so the aliases resolve to the
    # same modules — config compatibility without a duplicate tree.
    "QuantizablePanopticDeepLab": PanopticDeepLab,
    "QuantizablePanopticDeepLabPR": PanopticDeepLabPR,
    "QuantizablePanopticBiFPN": PanopticBiFPN,
    "QuantizablePanopticBiFPNPR": PanopticBiFPNPR,
}

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "bf16": jnp.bfloat16,
    "fp32": jnp.float32,
}


def create_model(arch: str, **kwargs):
    if arch not in MODELS:
        raise ValueError(f"unknown arch {arch!r}; choices: {sorted(MODELS)}")
    cls = MODELS[arch]
    dtype = kwargs.pop("dtype", "float32")
    if isinstance(dtype, str):
        dtype = _DTYPES[dtype]
    # accept (and ignore) reference-only kwargs for config compatibility
    valid = set(cls.__dataclass_fields__)
    dropped = {k: v for k, v in kwargs.items() if k not in valid}
    kwargs = {k: v for k, v in kwargs.items() if k in valid}
    return cls(dtype=dtype, **kwargs)

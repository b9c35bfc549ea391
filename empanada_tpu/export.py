"""Model export for deployment (reference scripts/export_model.py:77-199).

The TorchScript artifact maps to two TPU-native formats:
- params msgpack + YAML descriptor (model_config, norms, padding_factor,
  thing_list, labels, class_names, FINETUNE params) — the descriptor is
  consumed by the inference/finetune CLIs and the napari-plugin analog,
  exactly like the reference's exported YAML (export_model.py:173-196).
- optional ``jax.export`` StableHLO artifact for serving without Python
  model code.

The reference's INT8 fbgemm path is CPU-deployment specific; on TPU the
same models run in bf16 via the dtype policy (descriptor key ``dtype``),
and the Quantizable* arch aliases resolve to the same modules
(models/__init__.py).
"""

from __future__ import annotations

import os

import jax
import numpy as np
import yaml
from flax import serialization

from empanada_tpu.models import create_model

__all__ = ["export_model", "load_exported_model", "save_params",
           "load_params"]


def save_params(path, variables):
    host = jax.tree_util.tree_map(np.asarray, variables)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host))


def load_params(path, target=None):
    with open(path, "rb") as f:
        data = f.read()
    if target is not None:
        return serialization.from_bytes(target, data)
    return serialization.msgpack_restore(data)


def export_model(variables, model_config, save_dir, name,
                 norms=None, padding_factor=128, thing_list=(1,),
                 labels=(1,), class_names=None, finetune_params=None,
                 stablehlo=False, input_shape=(1, 512, 512, 1)):
    """Write <name>.params.msgpack + <name>.yaml (+ <name>.stablehlo).

    Returns the descriptor dict (also written to YAML)."""
    os.makedirs(save_dir, exist_ok=True)
    params_path = os.path.join(save_dir, f"{name}.params.msgpack")
    save_params(params_path, variables)

    desc = {
        "format": "empanada_tpu",
        "model": params_path,
        "model_config": dict(model_config),
        "norms": dict(norms) if norms else {"mean": 0.5, "std": 0.29},
        "padding_factor": padding_factor,
        "thing_list": list(thing_list),
        "labels": list(labels),
        "class_names": dict(class_names or {l: str(l) for l in labels}),
        "FINETUNE": finetune_params or {},
    }

    if stablehlo:
        hlo_path = os.path.join(save_dir, f"{name}.stablehlo")
        _export_stablehlo(variables, model_config, input_shape, hlo_path)
        desc["model_stablehlo"] = hlo_path

    with open(os.path.join(save_dir, f"{name}.yaml"), "w") as f:
        yaml.safe_dump(desc, f)
    return desc


def _export_stablehlo(variables, model_config, input_shape, out_path):
    """Serialize the eval forward to a portable StableHLO artifact."""
    from jax import export as jax_export

    cfg = dict(model_config)
    arch = cfg.pop("arch")
    model = create_model(arch, **cfg)

    def fwd(image):
        return model.apply(variables, image, train=False, render_steps=2,
                           interpolate_ins=False)

    exported = jax_export.export(jax.jit(fwd))(
        jax.ShapeDtypeStruct(input_shape, np.float32))
    with open(out_path, "wb") as f:
        f.write(exported.serialize())


def load_exported_model(descriptor_path):
    """Descriptor YAML -> (JittedModel, descriptor dict). The analog of
    torch.jit.load on the reference's exported model
    (reference pdl_inference3d.py:69-74)."""
    from empanada_tpu.inference.engines import JittedModel

    with open(descriptor_path) as f:
        desc = yaml.safe_load(f)

    cfg = dict(desc["model_config"])
    arch = cfg.pop("arch")
    model = create_model(arch, **cfg)

    params_path = desc["model"]
    if not os.path.isabs(params_path):
        params_path = os.path.join(os.path.dirname(descriptor_path),
                                   os.path.basename(params_path))
    variables = load_params(params_path)
    return JittedModel(model, variables), desc

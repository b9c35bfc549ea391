"""Torch-checkpoint weight loading (CEM pretrained encoders).

The reference loads CEM SwAV-pretrained torch encoders into its models
(reference scripts/train.py:127-157: 'encoder_pretraining' adds the
'encoder.' prefix, 'whole_pretraining' strips 'module.'). Those .pth.tar
files hold torch state dicts; this module converts them into the flax
encoder trees by *structural order matching*: both frameworks register
conv/BN parameters in identical definition order, so pairing the i-th
torch conv with the i-th flax conv kernel (shape-checked, with the
OIHW->HWIO transpose) reproduces the mapping without a hand-written name
table per architecture. Works for the resnet and regnet families.
"""

from __future__ import annotations

import numpy as np
from flax import traverse_util

__all__ = ["load_torch_state_dict", "convert_encoder_state_dict",
           "convert_flax_to_torch_state_dict", "load_encoder_pretraining",
           "reorder_like"]


def reorder_like(template, tree):
    """Return ``tree``'s values in ``template``'s key order.

    The structural converters match torch registration order against the
    flax tree's insertion order, which is trace order only for
    freshly-``init`` trees. Params that round-tripped through
    jit/optax/serialization come back with alphabetically sorted dict
    keys — pass the trained tree through this with a fresh ``init``
    template before converting."""
    flat_t = traverse_util.flatten_dict(template)
    flat = traverse_util.flatten_dict(tree)
    assert set(flat_t) == set(flat), (
        set(flat_t) ^ set(flat))
    return traverse_util.unflatten_dict({k: flat[k] for k in flat_t})


def _is_torchscript_archive(path):
    """True if ``path`` is a TorchScript zip (torch.jit.save): those hold
    a ``constants.pkl`` + ``code/`` tree instead of torch.save's
    ``data.pkl``. The product's distributed MitoNet weights are exactly
    this format (reference scripts/pdl_inference3d.py:69-74 and
    finetune.py:94 load them with torch.jit.load)."""
    import zipfile

    if not zipfile.is_zipfile(path):
        return False
    try:
        with zipfile.ZipFile(path) as zf:
            names = zf.namelist()
    except Exception:
        return False
    return any(n.endswith("constants.pkl") for n in names)


def load_torch_state_dict(path):
    """Load a torch checkpoint on CPU; returns (state_dict, norms).

    Accepts BOTH plain torch.save checkpoints (state dicts / dicts with a
    'state_dict' key, the CEM pretraining format) and TorchScript
    archives (torch.jit.save — the format the reference's deployed
    MitoNet_v1.pth models ship in): the latter are loaded with
    torch.jit.load and their recursive module state_dict is extracted."""
    import torch

    if _is_torchscript_archive(path):
        mod = torch.jit.load(path, map_location="cpu")
        sd = mod.state_dict()
        norms = None
    else:
        state = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(state, dict) and "state_dict" in state:
            sd = state["state_dict"]
            norms = state.get("norms")
        else:
            sd = state
            norms = None
    # strip DDP 'module.' prefixes (reference train.py:131-138)
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }
    if norms is not None and not isinstance(norms, dict):
        norms = {"mean": float(norms[0]), "std": float(norms[1])}
    return sd, norms


def _classify_torch(sd):
    """Split a torch state dict (in key order) into typed queues."""
    prefixes_bn = set()
    for k in sd:
        if k.endswith(".running_mean"):
            prefixes_bn.add(k[: -len(".running_mean")])

    convs, conv_biases, bn_scales, bn_biases, bn_means, bn_vars = \
        [], [], [], [], [], []
    fusion_weights = []
    convs1d = []
    seen_storage = set()
    for k, v in sd.items():
        if k.startswith("fc.") or ".fc." in k:
            continue  # classification head, never used (train.py:146)
        # modules shared across an nn.ModuleList (the reference BiFPN's
        # after-combine convs) appear once per registration in the state
        # dict — keep only the first occurrence of each tensor
        if hasattr(v, "data_ptr"):
            ptr = (v.data_ptr(), tuple(v.shape))
            if ptr in seen_storage:
                continue
            seen_storage.add(ptr)
        v = np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
        prefix = k.rsplit(".", 1)[0]
        leaf = k.rsplit(".", 1)[1]
        if prefix in prefixes_bn:
            {"weight": bn_scales, "bias": bn_biases,
             "running_mean": bn_means, "running_var": bn_vars,
             "num_batches_tracked": []}.get(leaf, []).append((k, v))
        elif leaf == "weight" and v.ndim == 4:
            convs.append((k, v))
        elif leaf == "weight" and v.ndim == 3:
            convs1d.append((k, v))  # Conv1d (PointRend MLP layers)
        elif leaf == "weights" and v.ndim == 1:
            fusion_weights.append((k, v))  # BiFPN fast-fusion params
        elif leaf == "bias":
            conv_biases.append((k, v))
    return (convs, conv_biases, bn_scales, bn_biases, bn_means, bn_vars,
            fusion_weights, convs1d)


def _registration_order(flat_keys):
    """Reorder flax paths to the reference's torch *registration* order.

    flax traces parameters in __call__ usage order, torch registers them
    in __init__ order. They agree everywhere except the PDL decoder,
    which registers aspp, then ALL project convs, then ALL fuse convs
    (reference decoders/panoptic_deeplab.py) while the flax trace
    interleaves project_i/fuse_i. Stable-sort with a group rank on those
    segment names to reconcile."""
    rank = {"aspp": 0, "project": 1, "fuse": 2}

    # first-appearance index of every child name under every parent
    child_order = {}
    for path in flat_keys:
        for depth in range(len(path)):
            parent = path[:depth]
            child_order.setdefault(parent, {})
            if path[depth] not in child_order[parent]:
                child_order[parent][path[depth]] = \
                    len(child_order[parent])

    def seg_key(parent, seg):
        base, _, suffix = seg.rpartition("_")
        if base in rank and suffix.isdigit():
            return (1, rank[base], int(suffix))
        # BiFPN top-down/bottom-up passes: torch registers resamplings,
        # then the (shared) after-combine conv, then the fusion weights;
        # flax traces fusion weights first and interleaves the rest
        if base == "resample" and suffix.isdigit():
            return (1, 0, int(suffix))
        if seg == "after":
            return (1, 5, 0)
        if seg == "fusion_weights":
            return (1, 6, 0)
        return (0, child_order[parent][seg], 0)

    return sorted(
        flat_keys,
        key=lambda path: tuple(
            seg_key(path[:d], path[d]) for d in range(len(path))))


def convert_encoder_state_dict(sd, params, batch_stats):
    """Map torch encoder weights onto flax (params, batch_stats) trees.

    Returns (new_params, new_batch_stats, report) — report lists matched
    and skipped entries. Raises on any shape mismatch.
    """
    (convs, conv_biases, bn_scales, bn_biases, bn_means, bn_vars,
     fusion_weights, convs1d) = _classify_torch(sd)

    flat_p_raw = traverse_util.flatten_dict(params)
    flat_p = {k: flat_p_raw[k] for k in _registration_order(flat_p_raw)}
    flat_s_raw = traverse_util.flatten_dict(batch_stats) \
        if batch_stats else {}
    flat_s = {k: flat_s_raw[k] for k in _registration_order(flat_s_raw)}

    queues = {
        "kernel": list(convs),
        "conv_bias": list(conv_biases),
        "scale": list(bn_scales),
        "bn_bias": list(bn_biases),
        "mean": list(bn_means),
        "var": list(bn_vars),
        "fusion": list(fusion_weights),
        "kernel1d": list(convs1d),
    }
    matched = []

    def take(queue_name, path, expect_shape, transform=None):
        queue = queues[queue_name]
        if not queue:
            raise ValueError(f"torch checkpoint ran out of {queue_name} "
                             f"params at flax path {'/'.join(path)}")
        k, v = queue.pop(0)
        if transform is not None:
            v = transform(v)
        if tuple(v.shape) != tuple(expect_shape):
            raise ValueError(
                f"shape mismatch {k} {v.shape} -> "
                f"{'/'.join(path)} {tuple(expect_shape)}")
        matched.append((k, "/".join(path)))
        return v.astype(np.float32)

    new_p = {}
    for path, p in flat_p.items():
        leaf = path[-1]
        in_bn = any("BatchNorm" in seg for seg in path)
        in_tconv = any("ConvTranspose" in seg for seg in path)
        if leaf == "kernel" and p.ndim == 4 and in_tconv:
            # torch ConvTranspose2d weight is (in, out, kh, kw) and flips
            # spatially relative to flax ConvTranspose (verified
            # numerically): -> (kh, kw, in, out) + spatial flip
            new_p[path] = take(
                "kernel", path, p.shape,
                lambda v: v.transpose(2, 3, 0, 1)[::-1, ::-1].copy())
        elif leaf == "kernel" and p.ndim == 4:
            new_p[path] = take("kernel", path, p.shape,
                               lambda v: v.transpose(2, 3, 1, 0))
        elif leaf == "kernel" and p.ndim == 2:
            # flax Dense <- torch Conv1d(kernel_size=1): (out, in, 1)
            def _conv1d_to_dense(v):
                if v.shape[2] != 1:
                    raise ValueError(
                        f"Conv1d kernel_size={v.shape[2]} cannot map to "
                        "a Dense layer (only kernel_size=1 supported)")
                return v[:, :, 0].T
            new_p[path] = take("kernel1d", path, p.shape, _conv1d_to_dense)
        elif leaf == "scale" and in_bn:
            new_p[path] = take("scale", path, p.shape)
        elif leaf == "bias" and in_bn:
            new_p[path] = take("bn_bias", path, p.shape)
        elif leaf == "bias":
            new_p[path] = take("conv_bias", path, p.shape)
        elif leaf == "fusion_weights":
            new_p[path] = take("fusion", path, p.shape)
        else:
            new_p[path] = p

    new_s = {}
    for path, s in flat_s.items():
        leaf = path[-1]
        if leaf == "mean":
            new_s[path] = take("mean", path, s.shape)
        elif leaf == "var":
            new_s[path] = take("var", path, s.shape)
        else:
            new_s[path] = s

    leftovers = {k: len(q) for k, q in queues.items() if q}
    report = {"matched": len(matched), "leftover": leftovers}
    return (traverse_util.unflatten_dict(new_p),
            traverse_util.unflatten_dict(new_s), report)


def convert_flax_to_torch_state_dict(sd_template, params, batch_stats=None):
    """Inverse of :func:`convert_encoder_state_dict`: fill a torch
    state-dict TEMPLATE (from a same-architecture reference model's
    ``.state_dict()``) with this framework's flax values.

    Deploys trained empanada_tpu models into the reference torch
    ecosystem (reference scripts/export_model.py torchscript artifacts,
    napari plugin) and powers the end-to-end accuracy-parity harness
    (tools/parity_e2e.py). Uses the same structural-order matching as
    the forward direction; transforms are the exact inverses
    (HWIO->OIHW, spatial un-flip for transpose convs, Dense->Conv1d).

    Returns (state_dict, report). Template-only entries (classification
    ``fc.``, ``num_batches_tracked``) keep their template values; keys
    aliased by weight sharing (the reference BiFPN's shared
    after-combine convs) all receive the shared tensor.
    """
    import torch

    # alias groups: modules shared across an nn.ModuleList appear once
    # per registration with the same storage — every later key mirrors
    # the first
    ptr_first, aliases = {}, {}
    for k, v in sd_template.items():
        if hasattr(v, "data_ptr"):
            ptr = (v.data_ptr(), tuple(v.shape))
            if ptr in ptr_first:
                aliases[k] = ptr_first[ptr]
            else:
                ptr_first[ptr] = k

    (convs, conv_biases, bn_scales, bn_biases, bn_means, bn_vars,
     fusion_weights, convs1d) = _classify_torch(sd_template)
    queues = {
        "kernel": list(convs),
        "conv_bias": list(conv_biases),
        "scale": list(bn_scales),
        "bn_bias": list(bn_biases),
        "mean": list(bn_means),
        "var": list(bn_vars),
        "fusion": list(fusion_weights),
        "kernel1d": list(convs1d),
    }

    out = {k: v for k, v in sd_template.items()}
    matched = []

    def give(queue_name, path, value, transform=None):
        queue = queues[queue_name]
        if not queue:
            raise ValueError(f"torch template ran out of {queue_name} "
                             f"params at flax path {'/'.join(path)}")
        k, tv = queue.pop(0)
        v = np.asarray(value, dtype=np.float32)
        if transform is not None:
            v = transform(v)
        if tuple(v.shape) != tuple(tv.shape):
            raise ValueError(
                f"shape mismatch {'/'.join(path)} {v.shape} -> "
                f"{k} {tuple(tv.shape)}")
        out[k] = torch.from_numpy(np.array(v, np.float32, copy=True))
        matched.append(("/".join(path), k))

    flat_p_raw = traverse_util.flatten_dict(params)
    flat_p = {k: flat_p_raw[k] for k in _registration_order(flat_p_raw)}
    flat_s_raw = traverse_util.flatten_dict(batch_stats) \
        if batch_stats else {}
    flat_s = {k: flat_s_raw[k] for k in _registration_order(flat_s_raw)}

    for path, p in flat_p.items():
        leaf = path[-1]
        in_bn = any("BatchNorm" in seg for seg in path)
        in_tconv = any("ConvTranspose" in seg for seg in path)
        if leaf == "kernel" and p.ndim == 4 and in_tconv:
            give("kernel", path, p,
                 lambda v: v[::-1, ::-1].transpose(2, 3, 0, 1))
        elif leaf == "kernel" and p.ndim == 4:
            give("kernel", path, p, lambda v: v.transpose(3, 2, 0, 1))
        elif leaf == "kernel" and p.ndim == 2:
            give("kernel1d", path, p, lambda v: v.T[:, :, None])
        elif leaf == "scale" and in_bn:
            give("scale", path, p)
        elif leaf == "bias" and in_bn:
            give("bn_bias", path, p)
        elif leaf == "bias":
            give("conv_bias", path, p)
        elif leaf == "fusion_weights":
            give("fusion", path, p)

    for path, s in flat_s.items():
        leaf = path[-1]
        if leaf == "mean":
            give("mean", path, s)
        elif leaf == "var":
            give("var", path, s)

    for k, first in aliases.items():
        out[k] = out[first]

    leftovers = {k: len(q) for k, q in queues.items() if q}
    report = {"matched": len(matched), "leftover": leftovers}
    return out, report


def load_encoder_pretraining(variables, path, encoder_key="encoder_mod"):
    """Load a CEM torch encoder checkpoint into a full model's variables
    (the 'encoder_pretraining' path, reference train.py:141-157).

    Returns (new_variables, norms)."""
    sd, norms = load_torch_state_dict(path)
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))

    enc_p, enc_s, report = convert_encoder_state_dict(
        sd, params[encoder_key], batch_stats.get(encoder_key, {}))
    params[encoder_key] = enc_p
    if encoder_key in batch_stats:
        batch_stats[encoder_key] = enc_s

    print(f"=> loaded encoder pretraining from {path}: "
          f"{report['matched']} tensors"
          + (f", leftover {report['leftover']}" if report["leftover"]
             else ""))
    new_vars = {"params": params}
    if batch_stats:
        new_vars["batch_stats"] = batch_stats
    return new_vars, norms

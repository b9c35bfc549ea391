"""TorchScript deployment-artifact ingestion (round-3 VERDICT missing #2).

The product's distributed MitoNet weights are TorchScript zip archives
loaded with torch.jit.load (reference scripts/pdl_inference3d.py:69-74,
finetune.py:94). These tests torch.jit.script the reference MitoNet
architecture in-process, save the archive, and prove it enters this
framework: load_torch_state_dict detects + unpacks it, the structural
converter consumes it with no leftovers, and the resulting exported
descriptor drives run_inference3d.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

R = "/root/reference/empanada/models"


def _load_reference_bifpn_pr():
    """File-location load of the reference PanopticBiFPNPR family (same
    technique as tests/test_torch_weights.py — oracles only, never
    imported by library code). Snapshots and restores sys.modules so the
    stub `empanada.*` entries cannot shadow the REAL reference package
    for tests that import it via sys.path (test_consensus_vs_reference
    et al.) in whatever order pytest runs files."""
    touched = [k for k in list(sys.modules) if k.split(".")[0] == "empanada"]
    snapshot = {k: sys.modules[k] for k in touched}
    try:
        return _load_reference_bifpn_pr_unsafe()
    finally:
        for k in [k for k in list(sys.modules)
                  if k.split(".")[0] == "empanada"]:
            if k in snapshot:
                sys.modules[k] = snapshot[k]
            else:
                del sys.modules[k]


def _load_reference_bifpn_pr_unsafe():
    for pkg in ("empanada", "empanada.models",
                "empanada.models.encoders", "empanada.models.decoders"):
        sys.modules.setdefault(pkg, types.ModuleType(pkg))

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("empanada.models.blocks", f"{R}/blocks.py")
    rn = load("empanada.models.encoders.resnet", f"{R}/encoders/resnet.py")
    rg = load("empanada.models.encoders.regnet", f"{R}/encoders/regnet.py")
    enc_pkg = sys.modules["empanada.models.encoders"]
    for mod in (rn, rg):
        for k in getattr(mod, "__all__", []):
            setattr(enc_pkg, k, getattr(mod, k))
    sys.modules["empanada.models"].encoders = enc_pkg
    load("empanada.models.decoders.aspp", f"{R}/decoders/aspp.py")
    dec = load("empanada.models.decoders.panoptic_deeplab",
               f"{R}/decoders/panoptic_deeplab.py")
    bif = load("empanada.models.decoders.bifpn", f"{R}/decoders/bifpn.py")
    dp = sys.modules["empanada.models.decoders"]
    dp.PanopticDeepLabDecoder = dec.PanopticDeepLabDecoder
    dp.BiFPN = bif.BiFPN
    dp.BiFPNDecoder = bif.BiFPNDecoder
    load("empanada.models.heads", f"{R}/heads.py")
    load("empanada.models.point_rend", f"{R}/point_rend.py")
    return load("empanada.models.panoptic_bifpn", f"{R}/panoptic_bifpn.py")


@pytest.fixture(scope="module")
def scripted_artifact(tmp_path_factory):
    """A TorchScript archive of the reference MitoNet architecture with
    randomized (non-default) weights, saved exactly like the product's
    deployment artifacts."""
    pb = _load_reference_bifpn_pr()
    torch.manual_seed(3)
    tmodel = pb.PanopticBiFPNPR(encoder="regnety_200mf", num_classes=1,
                                fpn_dim=96, fpn_layers=2).eval()
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.8, 1.2)
    path = tmp_path_factory.mktemp("ts") / "MitoNet_mini.pth"
    torch.jit.save(torch.jit.script(tmodel), str(path))
    return str(path), tmodel


def test_detects_and_loads_torchscript(scripted_artifact, tmp_path):
    from empanada_tpu.train.torch_weights import (
        _is_torchscript_archive,
        load_torch_state_dict,
    )

    path, tmodel = scripted_artifact
    assert _is_torchscript_archive(path)

    # a plain torch.save checkpoint must NOT be detected as TorchScript
    plain = tmp_path / "plain.pth"
    torch.save({"state_dict": tmodel.state_dict()}, str(plain))
    assert not _is_torchscript_archive(str(plain))

    sd, norms = load_torch_state_dict(path)
    ref_sd = tmodel.state_dict()
    assert set(sd) == set(ref_sd)
    for k in ref_sd:
        assert np.array_equal(sd[k].numpy(), ref_sd[k].numpy()), k


def test_torchscript_converts_like_eager(scripted_artifact):
    """The jit state dict must feed the structural converter identically
    to the eager state dict (whose conversion is golden-tested in
    test_torch_weights.py)."""
    import jax

    from empanada_tpu.models import create_model
    from empanada_tpu.train.torch_weights import (
        convert_encoder_state_dict,
        load_torch_state_dict,
    )

    path, tmodel = scripted_artifact
    sd_jit, _ = load_torch_state_dict(path)

    fmodel = create_model("PanopticBiFPNPR", encoder="regnety_200mf",
                          num_classes=1, fpn_dim=96, fpn_layers=2)
    variables = fmodel.init(
        {"params": jax.random.key(0), "points": jax.random.key(1),
         "dropout": jax.random.key(2)},
        np.zeros((1, 128, 128, 1), np.float32), train=False)

    p_jit, s_jit, rep_jit = convert_encoder_state_dict(
        sd_jit, variables["params"], variables["batch_stats"])
    assert not rep_jit["leftover"], rep_jit

    p_ref, s_ref, _ = convert_encoder_state_dict(
        tmodel.state_dict(), variables["params"], variables["batch_stats"])

    for a, b in ((p_jit, p_ref), (s_jit, s_ref)):
        fa = jax.tree_util.tree_leaves_with_path(a)
        fb = dict(jax.tree_util.tree_leaves_with_path(b))
        for key, leaf in fa:
            assert np.array_equal(np.asarray(leaf),
                                  np.asarray(fb[key])), key


def test_cli_from_torch_honors_export_flags(scripted_artifact, tmp_path):
    """`empanada-export --from-torch --quantize` must write the int8
    artifact — the import path used to return before applying the
    export flags, silently producing only the fp32 descriptor."""
    import yaml

    from empanada_tpu.cli.export import main as export_main

    path, _tmodel = scripted_artifact
    cfg = {
        "MODEL": {"arch": "PanopticBiFPNPR", "encoder": "regnety_200mf",
                  "num_classes": 1, "fpn_dim": 96, "fpn_layers": 2},
        "DATASET": {"labels": [1], "thing_list": [1],
                    "norms": {"mean": 0.5, "std": 0.25}},
    }
    cfg_path = tmp_path / "mini.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    export_main([str(cfg_path), path, str(tmp_path / "out"),
                 "-name", "mini", "--from-torch", "--quantize"])
    assert os.path.exists(tmp_path / "out" / "mini.int8.msgpack")


@pytest.mark.slow
def test_torchscript_artifact_runs_e2e_inference(scripted_artifact,
                                                 tmp_path):
    """import_torch_model on the TorchScript archive -> descriptor ->
    load_exported_model -> run_inference3d: the full user journey of
    bringing a reference-deployed .pth to this framework."""
    from empanada_tpu.cli.infer3d import run_inference3d
    from empanada_tpu.export import import_torch_model, load_exported_model

    path, _tmodel = scripted_artifact
    model_config = {"arch": "PanopticBiFPNPR", "encoder": "regnety_200mf",
                    "num_classes": 1, "fpn_dim": 96, "fpn_layers": 2}
    import_torch_model(path, model_config, str(tmp_path), "mini",
                       norms={"mean": 0.5, "std": 0.25})
    jm, desc = load_exported_model(os.path.join(tmp_path, "mini.yaml"))

    vol = np.random.default_rng(0).normal(
        0.5, 0.1, (8, 128, 128)).astype(np.float32)
    consensus = run_inference3d(
        jm, vol, labels=[1], thing_list=[1], mode="stack", qlen=3,
        label_divisor=100, min_size=10, min_span=1, padding_factor=128,
        max_centers=32, block_size=4, progress=False)
    assert 1 in consensus  # ran through matching/tracking/consensus

"""Every shipped config must load through the BASE-inheritance loader and
name-resolve against the live registries (reference set:
projects/mitonet/configs/*.yaml + train_ablation/*.yaml, 14 files)."""

import glob
import inspect
import os

import pytest

from empanada_tpu.config import load_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")
ALL = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))


def test_config_inventory_matches_reference():
    names = {os.path.basename(p) for p in ALL}
    # reference parity set (mmm_* / train_ablation equivalents)
    expected = {
        "finetune.yaml",
        "median_inference_base.yaml",
        "median_inference_lucchi.yaml",
        "median_inference_hela.yaml",
        "median_inference_fly_brain.yaml",
        "median_inference_celegans.yaml",
        "median_inference_glycolytic_muscle.yaml",
        "mitonet_panoptic_bifpn_pointrend.yaml",
        "panoptic_deeplab_bc.yaml",
        "panoptic_deeplab_pointrend.yaml",
        "ws_inference_fly_brain.yaml",
        "ablation_finetune.yaml",
        "ablation_instance_decoder.yaml",
        "ablation_point_rend.yaml",
    }
    missing = expected - names
    assert not missing, missing


@pytest.mark.parametrize("path", ALL, ids=os.path.basename)
def test_config_loads_and_resolves(path):
    config = load_config(path)
    name = os.path.basename(path)

    if "MODEL" in config and "arch" not in config["MODEL"]:
        # finetune recipe: MODEL.config points at an exported descriptor
        assert config["MODEL"]["config"].endswith(".yaml")
    elif "MODEL" in config:  # training recipe
        from empanada_tpu.models import MODELS, create_model

        model_cfg = dict(config["MODEL"])
        arch = model_cfg.pop("arch")
        assert arch in MODELS, arch
        encoder = model_cfg.get("encoder")
        if encoder:
            from empanada_tpu.models.encoders import get_encoder

            assert get_encoder(encoder) is not None
        # the whole MODEL block must instantiate through the factory
        assert create_model(arch, **model_cfg) is not None
    elif name.startswith("ws_inference"):
        from empanada_tpu.cli.evaluate3d_bc import run_bc_inference3d

        params = set(inspect.signature(run_bc_inference3d).parameters)
        for key in config:
            assert key in params, (name, key)
    elif name.startswith("median_inference") and name != "median_inference.yaml":
        from empanada_tpu.cli.infer3d import parse_args

        # recipe keys are flag defaults: parse with just the recipe
        args = parse_args(["-infer-config", path, "desc.yaml", "vol.zarr"])
        for key, val in config.items():
            if key != "BASE":
                assert getattr(args, key) == val, (name, key)


def test_recipe_unknown_key_rejected(tmp_path):
    from empanada_tpu.cli.infer3d import parse_args

    bad = tmp_path / "bad.yaml"
    bad.write_text("mode: stack\nnot_a_flag: 1\n")
    with pytest.raises(SystemExit):
        parse_args(["-infer-config", str(bad), "d.yaml", "v.zarr"])


def test_recipe_explicit_flag_wins():
    from empanada_tpu.cli.infer3d import parse_args

    path = os.path.join(CONFIG_DIR, "median_inference_lucchi.yaml")
    args = parse_args(["-infer-config", path, "-min-size", "42",
                       "d.yaml", "v.zarr"])
    assert args.min_size == 42
    assert args.qlen == 7 and args.min_span == 8  # from the recipe chain

def test_recipe_equals_form_and_abbreviation():
    # argparse-legal forms "-infer-config=path" and unambiguous prefix
    # abbreviations must apply the recipe too (two-pass parse), not
    # silently run with built-in defaults
    from empanada_tpu.cli.infer3d import parse_args

    path = os.path.join(CONFIG_DIR, "median_inference_lucchi.yaml")
    args = parse_args([f"-infer-config={path}", "d.yaml", "v.zarr"])
    assert args.qlen == 7 and args.min_span == 8
    args = parse_args(["-infer-conf", path, "d.yaml", "v.zarr"])
    assert args.qlen == 7


def test_recipe_flag_missing_value_errors():
    from empanada_tpu.cli.infer3d import parse_args

    with pytest.raises(SystemExit):  # argparse error, not IndexError
        parse_args(["d.yaml", "v.zarr", "-infer-config"])

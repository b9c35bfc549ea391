"""Export round-trip tests: descriptor + params, int8 quantization,
finetune-params plumbing."""

import os

import jax
import numpy as np
import pytest

from empanada_tpu.export import (
    dequantize_variables_int8,
    export_model,
    load_exported_model,
    quantize_variables_int8,
)
from empanada_tpu.models import create_model


@pytest.fixture(scope="module")
def tiny_variables():
    model = create_model("PanopticDeepLabPR", encoder="resnet18",
                         num_classes=1, subdivision_num_points=64)
    x = np.zeros((1, 32, 32, 1), np.float32)
    variables = model.init(
        {"params": jax.random.key(0), "points": jax.random.key(1),
         "dropout": jax.random.key(2)}, x, train=False)
    return variables


MODEL_CONFIG = {"arch": "PanopticDeepLabPR", "encoder": "resnet18",
                "num_classes": 1, "subdivision_num_points": 64}


class TestExport:
    def test_roundtrip(self, tmp_path, tiny_variables):
        desc = export_model(
            tiny_variables, MODEL_CONFIG, str(tmp_path), "m",
            norms={"mean": 0.5, "std": 0.2}, padding_factor=16,
            thing_list=[1], labels=[1], class_names={1: "mito"},
            finetune_params={"criterion": "PanopticLoss"})
        assert os.path.exists(os.path.join(tmp_path, "m.yaml"))
        model, desc2 = load_exported_model(str(tmp_path / "m.yaml"))
        assert desc2["norms"]["mean"] == 0.5
        assert desc2["FINETUNE"]["criterion"] == "PanopticLoss"
        out = model(np.zeros((1, 32, 32, 1), np.float32), 2, True)
        assert out["sem_logits"].shape == (1, 32, 32, 1)
        # loaded params match exactly
        ref = tiny_variables["params"]["semantic_head"]
        got = model.params["params"]["semantic_head"]
        np.testing.assert_array_equal(
            np.asarray(list(jax.tree_util.tree_leaves(ref))[0]),
            np.asarray(list(jax.tree_util.tree_leaves(got))[0]))

    def test_int8_quantization(self, tmp_path, tiny_variables):
        q = quantize_variables_int8(tiny_variables)
        back = dequantize_variables_int8(q)
        # relative error per large kernel < 1/127
        from flax import traverse_util

        orig = traverse_util.flatten_dict(tiny_variables)
        rest = traverse_util.flatten_dict(back)
        n_quantized = 0
        for key, v in orig.items():
            v = np.asarray(v)
            r = np.asarray(rest[key])
            if key[-1] == "kernel" and v.size > 4096:
                n_quantized += 1
                scale = np.abs(v).max()
                assert np.abs(v - r).max() <= scale / 127 + 1e-7
            else:
                np.testing.assert_array_equal(v, r)
        assert n_quantized > 10

    def test_quantized_descriptor_loads(self, tmp_path, tiny_variables):
        export_model(
            tiny_variables, MODEL_CONFIG, str(tmp_path), "q",
            thing_list=[1], labels=[1], quantize=True)
        fp_size = os.path.getsize(tmp_path / "q.params.msgpack")
        q_size = os.path.getsize(tmp_path / "q.int8.msgpack")
        assert q_size < 0.5 * fp_size
        model, _ = load_exported_model(str(tmp_path / "q.yaml"),
                                       quantized=True)
        out = model(np.zeros((1, 32, 32, 1), np.float32), 2, True)
        assert np.isfinite(np.asarray(out["sem_logits"])).all()

    def test_stablehlo_roundtrip(self, tmp_path, tiny_variables):
        """The serialized StableHLO artifact must reproduce the model's
        eval forward exactly when deserialized and called."""
        from jax import export as jax_export

        from empanada_tpu.models import create_model

        export_model(
            tiny_variables, MODEL_CONFIG, str(tmp_path), "h",
            thing_list=[1], labels=[1], stablehlo=True,
            input_shape=(1, 32, 32, 1))
        with open(tmp_path / "h.stablehlo", "rb") as f:
            exported = jax_export.deserialize(f.read())

        x = np.random.default_rng(0).normal(
            0, 1, (1, 32, 32, 1)).astype(np.float32)
        out = exported.call(x)
        cfg = dict(MODEL_CONFIG)
        model = create_model(cfg.pop("arch"), **cfg)
        ref = model.apply(tiny_variables, x, train=False, render_steps=2,
                          interpolate_ins=False)
        for k in ref:
            d = float(np.abs(np.asarray(out[k]) - np.asarray(ref[k])).max())
            assert d < 1e-5, (k, d)

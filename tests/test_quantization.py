"""Executing-int8 quantization: the TPU-native analog of the reference's
fbgemm export (reference scripts/export_model.py:137-163,
empanada/models/quantization/panoptic_deeplab.py:170-250). Asserts the
quantized model (a) actually computes in int8 (jaxpr-level check, not just
int8 storage), (b) tracks the fp32 model's continuous outputs, and (c)
survives the export round trip with panoptic-output parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from empanada_tpu.export import (
    export_model,
    load_exported_model,
    quantize_variables_int8,
)
from empanada_tpu.models import create_model
from empanada_tpu.models.quantization import (
    Int8Module,
    calibrate_activations,
    int8_conv_count,
)


@pytest.fixture(scope="module")
def tiny_model():
    model = create_model("PanopticDeepLabPR", encoder="resnet18",
                         num_classes=1, train_num_points=32,
                         subdivision_num_points=64)
    x = np.zeros((1, 64, 64, 1), np.float32)
    variables = model.init(
        {"params": jax.random.key(0), "points": jax.random.key(1),
         "dropout": jax.random.key(2)}, x, train=False)
    return model, variables


def _calib_batches(n=4, size=64, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.normal(0, 1, (1, size, size, 1)).astype(np.float32)
            for _ in range(n)]


APPLY_KW = dict(train=False, render_steps=2, interpolate_ins=False)


@pytest.mark.slow
class TestInt8Execution:
    def test_jaxpr_contains_int8_convs(self, tiny_model):
        """The quantized apply must trace to convs with int8 operands —
        executing int8, not the weight-only storage format."""
        model, variables = tiny_model
        scales = calibrate_activations(model, variables, _calib_batches(1),
                                       apply_kwargs=APPLY_KW)
        qvars = quantize_variables_int8(variables)
        q = Int8Module(model, scales)
        x = jnp.zeros((1, 64, 64, 1), jnp.float32)
        n = int8_conv_count(lambda v, im: q.apply(v, im, **APPLY_KW),
                            qvars, x)
        # resnet18 alone has ~20 quantizable convs
        assert n >= 15, f"only {n} int8 convs traced"
        # and the fp32 model traces none
        n_fp = int8_conv_count(
            lambda v, im: model.apply(v, im, **APPLY_KW), variables, x)
        assert n_fp == 0

    def test_outputs_track_fp32(self, tiny_model):
        """Continuous outputs (sem prob, center heatmap) of the int8 model
        stay close to fp32 — the PQ-delta guarantee at the map level."""
        model, variables = tiny_model
        scales = calibrate_activations(model, variables, _calib_batches(),
                                       apply_kwargs=APPLY_KW)
        qvars = quantize_variables_int8(variables)
        q = Int8Module(model, scales)

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(0, 1, (1, 64, 64, 1)).astype(np.float32))
        out_fp = jax.jit(lambda v, im: model.apply(v, im, **APPLY_KW))(
            variables, x)
        out_q = jax.jit(lambda v, im: q.apply(v, im, **APPLY_KW))(qvars, x)

        p_fp = jax.nn.sigmoid(out_fp["sem_logits"])
        p_q = jax.nn.sigmoid(out_q["sem_logits"])
        mae = float(jnp.mean(jnp.abs(p_fp - p_q)))
        assert mae < 0.03, f"sem prob MAE {mae}"
        ctr_err = float(jnp.mean(jnp.abs(out_fp["ctr_hmp"]
                                         - out_q["ctr_hmp"])))
        ctr_ref = float(jnp.mean(jnp.abs(out_fp["ctr_hmp"]))) + 1e-6
        assert ctr_err / ctr_ref < 0.25, (ctr_err, ctr_ref)

    def test_unquantized_kernels_fall_through(self, tiny_model):
        """Kernels below the size threshold stay fp32 and must run the
        normal flax path (mixed int8/fp32 graph)."""
        model, variables = tiny_model
        scales = calibrate_activations(model, variables, _calib_batches(1),
                                       apply_kwargs=APPLY_KW)
        qvars = quantize_variables_int8(variables)
        from flax import traverse_util

        flat = traverse_util.flatten_dict(qvars)
        n_q = sum(1 for k in flat if k[-1] == "__int8__")
        n_fp = sum(1 for k in flat if k[-1] == "kernel")
        assert n_q > 0 and n_fp > 0  # genuinely mixed
        q = Int8Module(model, scales)
        out = q.apply(qvars, jnp.zeros((1, 64, 64, 1)), **APPLY_KW)
        assert np.isfinite(np.asarray(out["sem_logits"])).all()


@pytest.mark.slow
class TestNonInterceptedKernels:
    def test_bifpn_convtranspose_stays_fp32(self):
        """BiFPN decoders carry large nn.ConvTranspose kernels that the
        interceptor does NOT execute in int8 — the quantizer must leave
        them float (path whitelist), or flax's normal path receives a
        dict kernel (regression: crashed the MitoNet int8 engine)."""
        model = create_model("PanopticBiFPNPR", encoder="regnety_200mf",
                             fpn_layers=1, num_classes=1,
                             train_num_points=16,
                             subdivision_num_points=32)
        # 128^2 minimum: BiFPN's P7 level is input/128
        x = np.zeros((1, 128, 128, 1), np.float32)
        variables = model.init(
            {"params": jax.random.key(0), "points": jax.random.key(1),
             "dropout": jax.random.key(2)}, x, train=False)
        scales = calibrate_activations(
            model, variables, _calib_batches(1, size=128),
            apply_kwargs=APPLY_KW)
        qvars = quantize_variables_int8(variables, scales.keys())
        q = Int8Module(model, scales)
        out = q.apply(qvars, jnp.asarray(x), **APPLY_KW)
        assert np.isfinite(np.asarray(out["sem_logits"])).all()
        n = int8_conv_count(lambda v, im: q.apply(v, im, **APPLY_KW),
                            qvars, jnp.asarray(x))
        assert n >= 10


class TestExportRoundTrip:
    def test_export_load_execute_int8(self, tiny_model, tmp_path):
        model, variables = tiny_model
        model_config = {"arch": "PanopticDeepLabPR", "encoder": "resnet18",
                        "num_classes": 1, "train_num_points": 32,
                        "subdivision_num_points": 64}
        desc = export_model(
            variables, model_config, str(tmp_path), "tiny",
            quantize=True, calibration_data=_calib_batches(),
            input_shape=(1, 64, 64, 1))
        assert "act_scales" in desc and len(desc["act_scales"]) > 10

        jm, desc2 = load_exported_model(str(tmp_path / "tiny.yaml"),
                                        quantized=True)
        assert isinstance(jm.module, Int8Module)
        x = jnp.asarray(np.random.default_rng(1).normal(
            0, 1, (1, 64, 64, 1)).astype(np.float32))
        n = int8_conv_count(
            lambda v, im: jm.module.apply(v, im, **APPLY_KW),
            jm.params, x)
        assert n >= 15
        out = jm(x, render_steps=2, interpolate_ins=False)
        assert np.isfinite(np.asarray(out["sem_logits"])).all()

    def test_fp32_load_unaffected(self, tiny_model, tmp_path):
        model, variables = tiny_model
        model_config = {"arch": "PanopticDeepLabPR", "encoder": "resnet18",
                        "num_classes": 1, "train_num_points": 32,
                        "subdivision_num_points": 64}
        export_model(variables, model_config, str(tmp_path), "tiny",
                     quantize=True, calibration_data=_calib_batches(1),
                     input_shape=(1, 64, 64, 1))
        jm, _ = load_exported_model(str(tmp_path / "tiny.yaml"))
        assert not isinstance(jm.module, Int8Module)
        # legacy weight-only artifact (no act_scales) still dequantizes
        import yaml

        with open(tmp_path / "tiny.yaml") as f:
            desc = yaml.safe_load(f)
        desc.pop("act_scales")
        with open(tmp_path / "legacy.yaml", "w") as f:
            yaml.safe_dump(desc, f)
        jm2, _ = load_exported_model(str(tmp_path / "legacy.yaml"),
                                     quantized=True)
        assert not isinstance(jm2.module, Int8Module)


@pytest.mark.slow
class TestQuantizedDeployment:
    def test_int8_model_through_run_inference3d(self, tiny_model,
                                                tmp_path):
        """The full deployment flow the --quantized CLI flag drives:
        export with calibration -> load int8 -> production 3D inference
        (fused engine + matching + tracking + consensus) completes with
        finite outputs."""
        import numpy as np

        from empanada_tpu.cli.infer3d import run_inference3d

        model, variables = tiny_model
        model_config = {"arch": "PanopticDeepLabPR", "encoder": "resnet18",
                        "num_classes": 1, "train_num_points": 32,
                        "subdivision_num_points": 64}
        export_model(variables, model_config, str(tmp_path), "tiny",
                     quantize=True, calibration_data=_calib_batches(1),
                     input_shape=(1, 64, 64, 1))
        jm, desc = load_exported_model(str(tmp_path / "tiny.yaml"),
                                       quantized=True)
        assert isinstance(jm.module, Int8Module)

        vol = (np.random.default_rng(2).random((6, 64, 64)) * 255) \
            .astype(np.uint8)
        consensus = run_inference3d(
            jm, vol, labels=[1], thing_list=[1], mode="stack",
            qlen=3, label_divisor=1000, min_size=1, min_span=1,
            block_size=4, padding_factor=16,
            norms=desc["norms"], progress=False)
        assert set(consensus) == {1}
        assert consensus[1].finished


@pytest.mark.slow
class TestPQDelta:
    def test_trained_model_pq_after_quantization(self, tmp_path):
        """Train a small model on synthetic blobs, then check the int8
        model's panoptic output against the fp32 model's: PQ >= 0.9
        (reference intent: the exported fbgemm model is deployment-
        equivalent, export_model.py:137-163)."""
        import cv2

        from empanada_tpu.inference.fused import FusedStackEngine
        from empanada_tpu.metrics import PQ
        from empanada_tpu.train import Trainer

        rng = np.random.default_rng(0)
        root = tmp_path / "data"
        for d in ("images", "masks"):
            (root / "ds0" / d).mkdir(parents=True)
        yy, xx = np.mgrid[:64, :64]
        for i in range(32):
            img = rng.normal(140, 8, (64, 64))
            msk = np.zeros((64, 64), np.uint16)
            for b in range(rng.integers(1, 4)):
                cy, cx = rng.integers(10, 54, 2)
                r = rng.integers(5, 11)
                blob = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
                img[blob] -= 60
                msk[blob] = b + 1
            cv2.imwrite(str(root / "ds0" / "images" / f"{i}.png"),
                        np.clip(img, 0, 255).astype(np.uint8))
            cv2.imwrite(str(root / "ds0" / "masks" / f"{i}.png"), msk)

        cfg = {
            "DATASET": {"class_names": {1: "blob"}, "labels": [1],
                        "thing_list": [1],
                        "norms": {"mean": 0.5, "std": 0.12}},
            "MODEL": {"arch": "PanopticDeepLabPR", "encoder": "resnet18",
                      "num_classes": 1, "train_num_points": 64,
                      "subdivision_num_points": 128},
            "TRAIN": {"run_name": "q", "model_dir": str(tmp_path / "m"),
                      "save_freq": 100, "finetune_layer": "all",
                      "lr_schedule": "OneCycleLR",
                      "schedule_params": {"max_lr": 0.001, "epochs": 6},
                      "optimizer": "AdamW",
                      "optimizer_params": {"weight_decay": 0.01},
                      "criterion": "PanopticLoss",
                      "criterion_params": {"ce_weight": 1,
                                           "mse_weight": 200,
                                           "l1_weight": 0.01,
                                           "top_k_percent": 0.2},
                      "print_freq": 100, "batch_size": 8, "workers": 2,
                      "dataset_class": "SingleClassInstanceDataset",
                      "dataset_params": {},
                      "augmentations": [
                          {"aug": "RandomCrop", "height": 64, "width": 64}],
                      "resume": None, "train_dir": str(root),
                      "logging": False},
        }
        trainer = Trainer(cfg)
        trainer.fit()
        model = trainer.model
        variables = {"params": trainer.state.params,
                     "batch_stats": trainer.state.batch_stats}

        # calibrate on (normalized) samples from the training family
        calib = []
        for i in range(4):
            img = cv2.imread(str(root / "ds0" / "images" / f"{i}.png"), 0)
            calib.append(((img / 255.0 - 0.5) / 0.12)
                         .astype(np.float32)[None, ..., None])
        scales = calibrate_activations(model, variables, calib,
                                       apply_kwargs=APPLY_KW)
        qvars = quantize_variables_int8(variables)

        vol = np.stack([cv2.imread(
            str(root / "ds0" / "images" / f"{i}.png"), 0)
            for i in range(8)])

        class DS:
            def __len__(self):
                return len(vol)

            def __getitem__(self, i):
                return {"image": vol[i], "size": vol[i].shape}

        kwargs = dict(thing_list=[1], block_size=4, median_kernel_size=3,
                      padding_factor=16, label_divisor=1000,
                      device_norms=(0.5, 0.12), pipeline_depth=0)
        eng_fp = FusedStackEngine(model, variables, **kwargs)
        eng_q = FusedStackEngine(Int8Module(model, scales), qvars, **kwargs)
        pan_fp = {z: np.asarray(p)
                  for z, p, _ in eng_fp.infer_stack(DS())}
        pan_q = {z: np.asarray(p) for z, p, _ in eng_q.infer_stack(DS())}

        from empanada_tpu.metrics import AverageMeter

        pq_metric = PQ(AverageMeter, labels=[1], label_divisor=1000)
        pqs = []
        for z in pan_fp:
            per_class = pq_metric.calculate(
                {"pan_seg": pan_q[z].astype(np.int64)},
                {"pan_seg": pan_fp[z].astype(np.int64)})
            pqs.append(per_class[1])
        assert np.mean(pqs) >= 0.9, f"PQ after int8 quantization {pqs}"


@pytest.mark.slow
class TestQuantizeScopeAndDrift:
    def test_drift_record_and_scope_all(self, tiny_model, tmp_path):
        """Export with calibration measures int8-vs-fp32 drift and
        records it (round-4 VERDICT next #7); PDL-family default scope
        is the full tree (reference quantization/panoptic_deeplab.py:
        170-192)."""
        model, variables = tiny_model
        model_config = {"arch": "PanopticDeepLabPR", "encoder": "resnet18",
                        "num_classes": 1, "train_num_points": 32,
                        "subdivision_num_points": 64}
        desc = export_model(
            variables, model_config, str(tmp_path), "tiny",
            quantize=True, calibration_data=_calib_batches(2),
            input_shape=(1, 64, 64, 1))
        assert desc["quantize_scope"] == "all"
        drift = desc["int8_drift"]
        assert set(drift) == {"sem_iou", "center_count_rel", "batches"}
        assert 0.0 <= drift["sem_iou"] <= 1.0
        assert drift["center_count_rel"] >= 0.0
        assert drift["batches"] == 2

    def test_encoder_scope_filters_paths(self, tiny_model, tmp_path):
        """quantize_scope='encoder' keeps only encoder_mod act scales —
        the reference's OWN BiFPN deployment config (its quantizable
        BiFPN tree quantizes the encoder only,
        reference models/quantization/panoptic_bifpn.py:36-57)."""
        model, variables = tiny_model
        model_config = {"arch": "PanopticDeepLabPR", "encoder": "resnet18",
                        "num_classes": 1, "train_num_points": 32,
                        "subdivision_num_points": 64}
        desc = export_model(
            variables, model_config, str(tmp_path), "enc",
            quantize=True, calibration_data=_calib_batches(1),
            quantize_scope="encoder", input_shape=(1, 64, 64, 1))
        assert desc["quantize_scope"] == "encoder"
        assert desc["act_scales"], "no encoder scales recorded"
        assert all(k.split("/")[0].startswith("encoder")
                   for k in desc["act_scales"])
        # the loaded artifact must still run (decoder/heads fp32)
        jm, _ = load_exported_model(str(tmp_path / "enc.yaml"),
                                    quantized=True)
        out = jm(jnp.zeros((1, 64, 64, 1), jnp.float32),
                 render_steps=2, interpolate_ins=False)
        assert np.isfinite(np.asarray(out["sem_logits"])).all()


def test_quantized_cli_warning_prints(capsys):
    """--quantized prints the measured drift (or a no-record warning) —
    the flag must not silently trade accuracy."""
    from empanada_tpu.cli.infer3d import print_quantized_warning

    print_quantized_warning({"int8_drift": {"sem_iou": 0.98,
                                            "center_count_rel": 0.031,
                                            "batches": 4},
                             "quantize_scope": "encoder"})
    out = capsys.readouterr().out
    assert "WARNING" in out and "3.1%" in out and "encoder" in out

    print_quantized_warning({})
    out = capsys.readouterr().out
    assert "WARNING" in out and "no measured drift" in out

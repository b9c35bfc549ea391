"""End-to-end CLI flows on tiny synthetic data: train -> export ->
infer3d (stack + orthoplane) -> evaluate. These are the product surfaces
(reference scripts/)."""

import json
import os

import cv2
import numpy as np
import pytest
import yaml

from empanada_tpu.data.zarr_store import create_zarr


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    rng = np.random.default_rng(0)
    for split in ("train", "eval"):
        for d in ("images", "masks"):
            os.makedirs(root / "data" / split / "ds0" / d, exist_ok=True)
        for i in range(8):
            img = (rng.random((64, 64)) * 255).astype(np.uint8)
            msk = np.zeros((64, 64), np.uint16)
            msk[8:24, 8:24] = 1
            msk[36:60, 30:58] = 2
            cv2.imwrite(str(root / "data" / split / "ds0" / "images" /
                            f"{i}.png"), img)
            cv2.imwrite(str(root / "data" / split / "ds0" / "masks" /
                            f"{i}.png"), msk)

    config = {
        "DATASET": {"dataset_name": "CLITest", "class_names": {1: "mito"},
                    "labels": [1], "thing_list": [1],
                    "norms": {"mean": 0.5, "std": 0.15}},
        "MODEL": {"arch": "PanopticDeepLabPR", "encoder": "resnet18",
                  "num_classes": 1, "train_num_points": 32,
                  "subdivision_num_points": 64},
        "TRAIN": {"run_name": "cli", "model_dir": str(root / "models"),
                  "save_freq": 1, "finetune_layer": "all",
                  "lr_schedule": "OneCycleLR",
                  "schedule_params": {"max_lr": 0.003, "epochs": 1},
                  "optimizer": "AdamW",
                  "optimizer_params": {"weight_decay": 0.1},
                  "criterion": "PanopticLoss", "criterion_params": {},
                  "print_freq": 1, "batch_size": 8, "workers": 2,
                  "dataset_class": "SingleClassInstanceDataset",
                  "dataset_params": {"weight_gamma": 0.7},
                  "augmentations": [
                      {"aug": "RandomCrop", "height": 64, "width": 64}],
                  "resume": None,
                  "train_dir": str(root / "data" / "train"),
                  "logging": False},
        "EVAL": {"eval_dir": None, "epochs_per_eval": 0,
                 "engine": "PanopticDeepLabRenderEngine3d",
                 "engine_params": {"thing_list": [1]}},
    }
    cfg_path = root / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    vol = (rng.random((8, 64, 64)) * 255).astype(np.uint8)
    z = create_zarr(str(root / "vol.zarr"), (8, 64, 64), chunks=(4, 32, 32),
                    dtype=np.uint8)
    z[:, :, :] = vol
    return root, str(cfg_path)


@pytest.mark.slow
class TestCLIFlows:
    def test_train_export_infer_evaluate(self, workspace):
        root, cfg_path = workspace

        from empanada_tpu.cli.train import main as train_main

        train_main([cfg_path])
        ckpt = str(root / "models" / "cli_checkpoint.msgpack")
        assert os.path.exists(ckpt)

        from empanada_tpu.cli.export import main as export_main

        export_main([cfg_path, ckpt, str(root / "exported"),
                     "-name", "m", "-pf", "16"])
        desc_path = str(root / "exported" / "m.yaml")
        assert os.path.exists(desc_path)

        from empanada_tpu.cli.infer3d import main as infer_main

        infer_main([desc_path, str(root / "vol.zarr"), "-mode", "stack",
                    "-qlen", "3", "-min-size", "0", "-min-span", "0",
                    "-max-centers", "64"])
        pred_json = str(root / "vol_stack_class1.json")
        assert os.path.exists(pred_json)
        assert os.path.exists(str(root / "vol_stack_seg_class1.zarr"))

        # evaluator consumes the tracker JSON (self-eval sanity)
        with open(pred_json) as f:
            n_inst = len(json.load(f)["instances"])
        if n_inst:
            from empanada_tpu.evaluation.evaluator import default_evaluator

            res = default_evaluator()(pred_json, pred_json)
            assert res["f1_50"] == 1.0

    def test_orthoplane_mode(self, workspace):
        root, cfg_path = workspace
        desc_path = str(root / "exported" / "m.yaml")
        if not os.path.exists(desc_path):
            pytest.skip("export step did not run")

        from empanada_tpu.cli.infer3d import main as infer_main

        infer_main([desc_path, str(root / "vol.zarr"),
                    "-mode", "orthoplane", "-qlen", "3", "-min-size", "0",
                    "-min-span", "0", "-max-centers", "64"])
        assert os.path.exists(str(root / "vol_orthoplane_seg_class1.zarr"))

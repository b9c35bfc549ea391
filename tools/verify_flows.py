"""End-to-end verification at the package boundary (public API only)."""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

# ---------------------------------------------------------------- Flow A
print("=== Flow A: 3D orthoplane inference pipeline ===")
from empanada_tpu.models import create_model
from empanada_tpu.inference.engines import (
    JittedModel, PanopticDeepLabRenderEngine3d)
from empanada_tpu.inference import patterns
from empanada_tpu.data import VolumeDataset
from empanada_tpu.data.zarr_store import create_zarr
from empanada_tpu.ops.rle_device import extract_runs

rng = np.random.default_rng(0)
D, H, W = 8, 64, 64
vol = rng.normal(0.0, 0.2, (D, H, W)).astype(np.float32)
# bright ball -> the untrained model still produces *some* deterministic seg
zz, yy, xx = np.mgrid[:D, :H, :W]
ball = ((zz - 4) ** 2 * 16 + (yy - 32) ** 2 + (xx - 32) ** 2) <= 200
vol[ball] += 2.0

model = create_model("PanopticDeepLabPR", encoder="resnet18", num_classes=1,
                     subdivision_num_points=256)
variables = model.init(
    {"params": jax.random.key(0), "points": jax.random.key(1),
     "dropout": jax.random.key(2)},
    np.zeros((1, 64, 64, 1), np.float32), train=False)
jm = JittedModel(model, variables)

label_divisor = 1000
thing_list = [1]
axes = {"xy": 0, "xz": 1, "yz": 2}
trackers = patterns.create_axis_trackers(axes, [1], label_divisor, (D, H, W))

for axis_name, axis in axes.items():
    engine = PanopticDeepLabRenderEngine3d(
        jm, thing_list, label_divisor=label_divisor, median_kernel_size=3,
        padding_factor=16, stuff_area=0, max_centers=64)
    matchers = patterns.create_matchers(thing_list, label_divisor, 0.25, 0.25)
    fm = patterns.ForwardMatcher(matchers, [1], label_divisor, thing_list)
    ds = VolumeDataset(vol, axis=axis)
    n = len(ds)
    for i in range(n):
        ex = ds[i]
        pan = engine(ex["image"][..., None], ex["size"])
        if pan is not None:
            runs = extract_runs(pan, max_runs=1024)
            fm.put((pan,) + runs)
    for pan in engine.end():
        runs = extract_runs(pan, max_runs=1024)
        fm.put((pan,) + runs)
    rle_stack = fm.finish()
    assert len(rle_stack) == n, (axis_name, len(rle_stack), n)
    for rev_idx, rle_seg in patterns.backward_matching(rle_stack, matchers, n):
        patterns.update_trackers(rle_seg, rev_idx, trackers[axis_name])
    patterns.finish_tracking(trackers[axis_name])
    n_inst = len(trackers[axis_name][0].instances)
    print(f"  axis {axis_name}: {n} slices -> {n_inst} tracked instances")

class_trackers = patterns.get_axis_trackers_by_class(trackers, 1)
consensus = patterns.create_instance_consensus(
    class_trackers, pixel_vote_thr=2, cluster_iou_thr=0.75)
patterns.apply_filters(consensus, [{"name": "remove_small_objects",
                                    "min_size": 20}])
print(f"  consensus: {len(consensus.instances)} instances after filters")

out = create_zarr("/tmp/verify_out.zarr", (D, H, W), chunks=(4, 32, 32),
                  dtype=np.uint32, overwrite=True)
patterns.fill_volume(out, consensus.instances, processes=2)
seg = np.asarray(out)
print(f"  filled zarr: {int((seg > 0).sum())} fg voxels, "
      f"ids {sorted(set(np.unique(seg)) - {0})[:5]}")

# JSON interchange round trip
consensus.write_to_json("/tmp/verify_tracker.json")
from empanada_tpu.inference.tracker import InstanceTracker
t2 = InstanceTracker()
t2.load_from_json("/tmp/verify_tracker.json")
assert set(t2.instances) == set(consensus.instances)
print("  tracker JSON round-trip OK")

# --- Flow A2: same pipeline with content-bearing model outputs ----------
print("=== Flow A2: orthoplane consensus reproduces a known object ===")


class SyntheticModel:
    """Engine-contract callable producing maps for the GT ball slices.
    sem at full res; ctr/offsets at 1/4 res (interpolate_ins=False)."""

    def __init__(self, mask2d_fn):
        self.mask2d_fn = mask2d_fn
        self.i = 0

    def __call__(self, image, render_steps=2, interpolate_ins=True):
        h, w = image.shape[1:3]
        m = self.mask2d_fn(self.i).astype(np.float32)
        ph, pw = h - m.shape[0], w - m.shape[1]
        m = np.pad(m, ((0, ph), (0, pw)))
        self.i += 1
        sem = np.where(m > 0, 8.0, -8.0).astype(np.float32)
        q = m[::4, ::4]
        hq, wq = q.shape
        ctr = np.zeros((hq, wq), np.float32)
        off = np.zeros((hq, wq, 2), np.float32)
        ys, xs = np.nonzero(q)
        if len(ys):
            cy, cx = ys.mean(), xs.mean()
            ctr[int(cy), int(cx)] = 1.0
            yy, xx = np.mgrid[:hq, :wq]
            off[..., 0] = np.where(q > 0, (cy - yy) * 4, 0)
            off[..., 1] = np.where(q > 0, (cx - xx) * 4, 0)
        import jax.numpy as jnp
        return {"sem_logits": jnp.asarray(sem)[None, :, :, None],
                "ctr_hmp": jnp.asarray(ctr)[None, :, :, None],
                "offsets": jnp.asarray(off)[None]}


trackers2 = patterns.create_axis_trackers(axes, [1], label_divisor, (D, H, W))
for axis_name, axis in axes.items():
    sm = SyntheticModel(lambda i, a=axis: np.take(ball, i, axis=a))
    engine = PanopticDeepLabRenderEngine3d(
        sm, thing_list, label_divisor=label_divisor, median_kernel_size=3,
        padding_factor=16, stuff_area=0, max_centers=64)
    matchers = patterns.create_matchers(thing_list, label_divisor, 0.25, 0.25)
    fm = patterns.ForwardMatcher(matchers, [1], label_divisor, thing_list)
    ds = VolumeDataset(vol, axis=axis)
    n = len(ds)
    for i in range(n):
        ex = ds[i]
        pan = engine(ex["image"][..., None], ex["size"])
        if pan is not None:
            fm.put((pan,) + extract_runs(pan, max_runs=1024))
    for pan in engine.end():
        fm.put((pan,) + extract_runs(pan, max_runs=1024))
    rle_stack = fm.finish()
    for rev_idx, rle_seg in patterns.backward_matching(rle_stack, matchers, n):
        patterns.update_trackers(rle_seg, rev_idx, trackers2[axis_name])
    patterns.finish_tracking(trackers2[axis_name])
    print(f"  axis {axis_name}: "
          f"{len(trackers2[axis_name][0].instances)} instances")

consensus2 = patterns.create_instance_consensus(
    patterns.get_axis_trackers_by_class(trackers2, 1),
    pixel_vote_thr=2, cluster_iou_thr=0.75)
assert len(consensus2.instances) == 1, len(consensus2.instances)
seg2 = np.zeros((D, H, W), np.int64)
patterns.fill_volume(seg2, consensus2.instances)
inter = ((seg2 > 0) & ball).sum()
union = ((seg2 > 0) | ball).sum()
iou = inter / union
print(f"  consensus vs GT ball IoU = {iou:.3f}")
assert iou > 0.8, iou

# ---------------------------------------------------------------- Flow B
print("=== Flow B: config-driven training ===")
import cv2
import yaml

root = "/tmp/verify_train_data"
for d in ("images", "masks"):
    os.makedirs(f"{root}/ds0/{d}", exist_ok=True)
for i in range(8):
    img = (rng.random((64, 64)) * 255).astype(np.uint8)
    msk = np.zeros((64, 64), np.uint16)
    msk[8:24, 8:24] = 1
    msk[36:60, 30:58] = 2
    cv2.imwrite(f"{root}/ds0/images/{i}.png", img)
    cv2.imwrite(f"{root}/ds0/masks/{i}.png", msk)

config = {
    "DATASET": {"class_names": {1: "mito"}, "labels": [1],
                "thing_list": [1], "norms": {"mean": 0.5, "std": 0.15}},
    "MODEL": {"arch": "PanopticDeepLabPR", "encoder": "resnet18",
              "num_classes": 1, "train_num_points": 64,
              "subdivision_num_points": 128},
    "TRAIN": {
        "run_name": "verify", "model_dir": "/tmp/verify_models",
        "save_freq": 1, "finetune_layer": "all",
        "lr_schedule": "OneCycleLR",
        "schedule_params": {"max_lr": 0.003, "epochs": 2, "pct_start": 0.3},
        "optimizer": "AdamW", "optimizer_params": {"weight_decay": 0.1},
        "criterion": "PanopticLoss",
        "criterion_params": {"ce_weight": 1, "mse_weight": 200,
                             "l1_weight": 0.01, "top_k_percent": 0.2},
        "print_freq": 1, "batch_size": 8, "workers": 2,
        "dataset_class": "SingleClassInstanceDataset",
        "dataset_params": {"weight_gamma": 0.7},
        "augmentations": [
            {"aug": "RandomCrop", "height": 64, "width": 64},
            {"aug": "HorizontalFlip"},
        ],
        "resume": None,
    },
}
# config loader with BASE inheritance through a real file
os.makedirs("/tmp/verify_cfg", exist_ok=True)
with open("/tmp/verify_cfg/base.yaml", "w") as f:
    yaml.safe_dump(config, f)
with open("/tmp/verify_cfg/child.yaml", "w") as f:
    yaml.safe_dump({"BASE": "base.yaml",
                    "TRAIN": {"batch_size": 8, "print_freq": 1}}, f)
from empanada_tpu.config import load_config
cfg = load_config("/tmp/verify_cfg/child.yaml")
assert cfg["MODEL"]["arch"] == "PanopticDeepLabPR"
assert cfg["TRAIN"]["batch_size"] == 8

cfg["TRAIN"]["train_dir"] = root
from empanada_tpu.train import Trainer
from empanada_tpu.parallel import create_mesh

trainer = Trainer(cfg, mesh=create_mesh(8), seed=0)
hist = trainer.fit()
l0, l1 = hist[0]["total_loss"], hist[-1]["total_loss"]
print(f"  loss epoch0 {l0:.4f} -> epoch1 {l1:.4f}")
assert np.isfinite(l1)
ckpt = "/tmp/verify_models/verify_checkpoint.msgpack"
assert os.path.exists(ckpt), "checkpoint not written"

# resume from checkpoint
cfg["TRAIN"]["resume"] = ckpt
cfg["TRAIN"]["schedule_params"]["epochs"] = 3
t2 = Trainer(cfg, mesh=create_mesh(8), seed=0)
h2 = t2.fit()
assert t2.start_epoch == 2, t2.start_epoch
print(f"  resumed at epoch {t2.start_epoch}, ran {len(h2)} more epoch(s)")
print("ALL FLOWS PASSED")

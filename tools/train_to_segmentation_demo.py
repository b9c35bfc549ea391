"""End-to-end quality demo: train a small PanopticDeepLabPR on synthetic
blobs (CPU mesh, ~5 min), export it, run the production 3D inference
pipeline, and score 3D PQ/F1 against ground truth. Expected: all 3
instances found, F1@50 >= 0.6 after only 12 quick epochs.

Run: PYTHONPATH=. python tools/train_to_segmentation_demo.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
os.environ['JAX_PLATFORMS'] = 'cpu'
import jax; jax.config.update('jax_platforms', 'cpu')
import numpy as np, cv2

rng = np.random.default_rng(0)
root = '/tmp/learndata'
for d in ('images', 'masks'):
    os.makedirs(f'{root}/ds0/{d}', exist_ok=True)

def make_example(rng, h=64, w=64, n_blobs=(1, 4)):
    img = rng.normal(140, 8, (h, w))
    msk = np.zeros((h, w), np.uint16)
    yy, xx = np.mgrid[:h, :w]
    for i in range(rng.integers(*n_blobs)):
        cy, cx = rng.integers(10, h-10), rng.integers(10, w-10)
        r = rng.integers(5, 11)
        blob = (yy-cy)**2 + (xx-cx)**2 <= r*r
        img[blob] -= 60
        msk[blob] = i + 1
    return np.clip(img, 0, 255).astype(np.uint8), msk

for i in range(64):
    img, msk = make_example(rng)
    cv2.imwrite(f'{root}/ds0/images/{i}.png', img)
    cv2.imwrite(f'{root}/ds0/masks/{i}.png', msk)

cfg = {
  'DATASET': {'class_names': {1: 'blob'}, 'labels': [1], 'thing_list': [1],
              'norms': {'mean': 0.5, 'std': 0.12}},
  'MODEL': {'arch': 'PanopticDeepLabPR', 'encoder': 'resnet18', 'num_classes': 1,
            'train_num_points': 128, 'subdivision_num_points': 256},
  'TRAIN': {'run_name': 'learn', 'model_dir': '/tmp/learnmodels', 'save_freq': 100,
            'finetune_layer': 'all', 'lr_schedule': 'OneCycleLR',
            'schedule_params': {'max_lr': 0.001, 'epochs': 12},
            'optimizer': 'AdamW', 'optimizer_params': {'weight_decay': 0.01},
            'criterion': 'PanopticLoss',
            'criterion_params': {'ce_weight': 1, 'mse_weight': 200, 'l1_weight': 0.01, 'top_k_percent': 0.2},
            'print_freq': 8, 'batch_size': 8, 'workers': 4,
            'dataset_class': 'SingleClassInstanceDataset', 'dataset_params': {},
            'augmentations': [{'aug': 'RandomCrop', 'height': 64, 'width': 64},
                              {'aug': 'HorizontalFlip'}, {'aug': 'VerticalFlip'}],
            'resume': None, 'train_dir': root, 'logging': False},
}
from empanada_tpu.train import Trainer
tr = Trainer(cfg)
hist = tr.fit()
print('final losses:', {k: round(v, 4) for k, v in hist[-1].items()})
assert hist[-1]['sem_iou'] > 0.5, f"model failed to learn: IoU {hist[-1]['sem_iou']}"

# export + 3D inference on a synthetic volume of the same blob family
vars_ = {'params': tr.state.params}
if tr.state.batch_stats: vars_['batch_stats'] = tr.state.batch_stats
from empanada_tpu.export import export_model
export_model(vars_, cfg['MODEL'], '/tmp/learnexport', 'blobnet',
             norms=cfg['DATASET']['norms'], padding_factor=16, thing_list=[1], labels=[1])

# build a small 3D volume: spheres in noise + GT instance volume
D, H, W = 12, 64, 64
vol = rng.normal(140, 8, (D, H, W))
gt = np.zeros((D, H, W), np.uint32)
zz, yy, xx = np.mgrid[:D, :H, :W]
for i, (cz, cy, cx, r) in enumerate([(5, 20, 20, 7), (6, 45, 40, 8), (4, 30, 52, 5)]):
    ball = (zz-cz)**2*4 + (yy-cy)**2 + (xx-cx)**2 <= r*r
    vol[ball] -= 60
    gt[ball] = i + 1
vol = np.clip(vol, 0, 255).astype(np.uint8)

from empanada_tpu.data.zarr_store import create_zarr
z = create_zarr('/tmp/learnvol.zarr', (D, H, W), chunks=(4, 32, 32), dtype=np.uint8, overwrite=True)
z[:, :, :] = vol

from empanada_tpu.export import load_exported_model
from empanada_tpu.cli.infer3d import run_inference3d
model, desc = load_exported_model('/tmp/learnexport/blobnet.yaml')
consensus = run_inference3d(
    model, np.asarray(z), labels=[1], thing_list=[1], mode='stack',
    qlen=3, label_divisor=1000, seg_thr=0.5, nms_thr=0.2, nms_kernel=7,
    min_size=100, min_span=2, max_centers=64, block_size=4,
    padding_factor=16, norms=desc['norms'])
pred = np.zeros((D, H, W), np.int64)
from empanada_tpu.inference.patterns import fill_volume
fill_volume(pred, consensus[1].instances)
print('pred instances:', len(consensus[1].instances))

# score PQ vs GT
from empanada_tpu.metrics import PQ, F1, AverageMeter
gt_pan = np.where(gt > 0, 1000 + gt, 0).astype(np.int64)
o = {'pan_seg': pred}; t = {'pan_seg': gt_pan}
pq = PQ(AverageMeter, [1], 1000).calculate(o, t)[1]
f1 = F1(AverageMeter, [1], 1000).calculate(o, t)[1]
print(f'3D PQ={pq:.3f} F1@50={f1:.3f}')
assert f1 >= 0.6, f1
print('stack mode OK')

# ---- orthoplane: isotropic spheres through the full 3-axis consensus ----
D = H = W = 48
vol = rng.normal(140, 8, (D, H, W))
gt = np.zeros((D, H, W), np.uint32)
zz, yy, xx = np.mgrid[:D, :H, :W]
for i, (cz, cy, cx, r) in enumerate([(14, 14, 14, 7), (30, 34, 20, 8), (22, 24, 38, 6)]):
    ball = (zz-cz)**2 + (yy-cy)**2 + (xx-cx)**2 <= r*r
    vol[ball] -= 60
    gt[ball] = i + 1
vol = np.clip(vol, 0, 255).astype(np.uint8)
cons = run_inference3d(model, vol, labels=[1], thing_list=[1], mode='orthoplane',
    qlen=3, label_divisor=1000, seg_thr=0.5, nms_thr=0.2, nms_kernel=7,
    min_size=50, min_span=2, max_centers=64, block_size=4,
    padding_factor=16, norms=desc['norms'], progress=False)
pred = np.zeros((D, H, W), np.int64)
fill_volume(pred, cons[1].instances)
# consensus ids are 1..n (reference convention); window for PQ
pred_pan = np.where(pred > 0, 1000 + pred, 0)
gt_pan2 = np.where(gt > 0, 1000 + gt.astype(np.int64), 0)
pq = PQ(AverageMeter, [1], 1000).calculate({'pan_seg': pred_pan}, {'pan_seg': gt_pan2})[1]
f1o = F1(AverageMeter, [1], 1000).calculate({'pan_seg': pred_pan}, {'pan_seg': gt_pan2})[1]
print(f'ORTHOPLANE PQ={pq:.3f} F1@50={f1o:.3f}')
assert f1o >= 0.6, f1o
print('LEARNED END-TO-END OK (stack + orthoplane)')

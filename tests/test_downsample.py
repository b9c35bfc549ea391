"""downsample_f > 1 on non-multiple volume shapes.

The reference's cheap low-res + PointRend-upsample path
(pdl_inference3d.py:50-51, engines.py:300-325): slices are downscaled by
f before the forward, the render head upsamples sem back to full
resolution, and coarse instance cells are voted onto the full-res grid.
Production volumes are rarely multiples of f or the padding factor, so
these tests pin the crop/pad arithmetic end to end on odd shapes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from empanada_tpu.data import VolumeDataset
from empanada_tpu.inference.fused import FusedStackEngine
from tests.synthetic import SyntheticModule



def _blob_volume(shape, center, radii):
    zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
    mask = ((zz - center[0]) ** 2 / radii[0] ** 2
            + (yy - center[1]) ** 2 / radii[1] ** 2
            + (xx - center[2]) ** 2 / radii[2] ** 2) <= 1.0
    return mask.astype(np.float32), mask


ENGINE_KW = dict(thing_list=[1], label_divisor=100, stuff_area=0,
                 median_kernel_size=3, padding_factor=16, max_centers=64,
                 block_size=4)


@pytest.mark.parametrize("shape", [(9, 65, 47), (7, 50, 33)])
@pytest.mark.parametrize("f", [2, 4])
def test_fused_downsampled_shapes(shape, f):
    """Emitted pan slices must come back at the ORIGINAL (pre-downsample)
    slice shape on every axis, for shapes not divisible by f."""
    vol, _ = _blob_volume(shape, np.array(shape) // 2,
                          (max(shape[0] // 3, 2), shape[1] // 3,
                           shape[2] // 3))
    for axis in (0, 1, 2):
        ds = VolumeDataset(vol, axis=axis, scale=f)
        engine = FusedStackEngine(SyntheticModule(), {}, **ENGINE_KW)
        slice_shape = tuple(s for i, s in enumerate(shape) if i != axis)
        count = 0
        for z, pan, _runs in engine.infer_stack(ds, upsampling=f):
            assert pan.shape == slice_shape, (axis, pan.shape, slice_shape)
            count += 1
        assert count == shape[axis]


def test_downsampled_consensus_reconstructs_object():
    """Full orthoplane consensus at downsample_f=2 on a non-multiple
    shape must reconstruct the object: one instance, IoU vs GT high
    (boundary voxels may flip by ~f from the low-res forward)."""
    from empanada_tpu.cli.infer3d import run_inference3d

    shape = (22, 65, 47)
    vol, gt = _blob_volume(shape, (11, 32, 23), (8, 22, 16))

    for f, min_iou in ((1, 0.98), (2, 0.85)):
        consensus = run_inference3d(
            (SyntheticModule(), {}), vol, labels=[1], thing_list=[1],
            mode="orthoplane", qlen=3, label_divisor=100, seg_thr=0.5,
            nms_thr=0.1, nms_kernel=3, iou_thr=0.25, ioa_thr=0.25,
            pixel_vote_thr=2, cluster_iou_thr=0.75, min_size=50,
            min_span=2, downsample_f=f, padding_factor=16,
            max_centers=64, block_size=4, progress=False)
        tracker = consensus[1]
        assert len(tracker.instances) == 1, (f, len(tracker.instances))

        from empanada_tpu.inference import patterns

        out = np.zeros(shape, np.uint32)
        patterns.fill_volume(out, tracker.instances, processes=1)
        inter = np.logical_and(out > 0, gt).sum()
        union = np.logical_or(out > 0, gt).sum()
        iou = inter / union
        assert iou >= min_iou, (f, iou)


def test_downsampled_uint8_volume_is_normalized():
    """Regression (round-2 VERDICT weak #7): a uint8 volume with
    descriptor norms and downsample_f>1 takes the STREAMING path, which
    must still apply (x/255 - mean)/std on device. Before the fix the
    host tfs was dead and the raw 0-255 floats hit the model."""
    from empanada_tpu.cli.infer3d import run_inference3d
    from empanada_tpu.inference import patterns

    shape = (12, 65, 47)
    _, gt = _blob_volume(shape, (6, 32, 23), (4, 22, 16))
    # blob 229/255=0.9, bg 25/255=0.1; norms (0.2, 0.5) puts the blob at
    # 1.4 and background at -0.2 around the module's 0.5 threshold
    vol_u8 = np.where(gt, 229, 25).astype(np.uint8)
    norms = {"mean": 0.2, "std": 0.5}
    vol_f32 = ((vol_u8.astype(np.float32) / 255.0 - 0.2) / 0.5)

    kw = dict(labels=[1], thing_list=[1], mode="stack", qlen=3,
              label_divisor=100, seg_thr=0.5, nms_thr=0.1, nms_kernel=3,
              iou_thr=0.25, ioa_thr=0.25, pixel_vote_thr=2,
              cluster_iou_thr=0.75, min_size=50, min_span=2,
              downsample_f=2, padding_factor=16, max_centers=64,
              block_size=4, progress=False)
    outs = []
    for vol, n in ((vol_u8, norms), (vol_f32, None)):
        consensus = run_inference3d((SyntheticModule(), {}), vol,
                                    norms=n, **kw)
        assert len(consensus[1].instances) == 1
        out = np.zeros(shape, np.uint32)
        patterns.fill_volume(out, consensus[1].instances, processes=1)
        outs.append(out > 0)
    inter = np.logical_and(*outs).sum()
    union = np.logical_or(*outs).sum()
    assert inter / union >= 0.99, inter / union


def test_integer_volume_without_norms_raises():
    from empanada_tpu.cli.infer3d import run_inference3d

    vol = np.zeros((8, 32, 32), np.uint8)
    with pytest.raises(ValueError, match="normalization"):
        run_inference3d((SyntheticModule(), {}), vol, labels=[1],
                        thing_list=[1], progress=False)

"""Direct parity: the on-device panoptic postprocess vs the reference's
own torch.jit postprocess kernels (reference inference/postprocess.py —
torch-only, loadable standalone). This is the seam the driver's PQ/F1
delta measures."""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/empanada/inference/postprocess.py"


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_post", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _maps(rng, h, w, blobs, noise=0.5):
    sem = np.zeros((h, w), np.float32)
    ctr = np.zeros((h, w), np.float32)
    off = np.zeros((2, h, w), np.float32)
    yy, xx = np.mgrid[:h, :w]
    for cy, cx, r in blobs:
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        sem[m] = 6.0
        ctr += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 18.0)
        off[0][m] = (cy - yy)[m]
        off[1][m] = (cx - cx + cx - xx)[m]
    sem += rng.normal(0, noise, sem.shape).astype(np.float32)
    return 1 / (1 + np.exp(-sem)), ctr, off


@pytest.mark.parametrize("seed,stuff_area,nms_kernel", [
    (0, 64, 7), (1, 0, 7), (2, 64, 3),
])
def test_panoptic_postprocess_matches_reference(seed, stuff_area,
                                                nms_kernel):
    import jax.numpy as jnp

    from empanada_tpu.metrics import PQ, AverageMeter
    from empanada_tpu.ops.postprocess import get_panoptic_segmentation

    rp = _load_ref()
    rng = np.random.default_rng(seed)
    H = W = 128
    n = int(rng.integers(3, 7))
    blobs = [(int(rng.integers(15, H - 15)), int(rng.integers(15, W - 15)),
              int(rng.integers(7, 14))) for _ in range(n)]
    sem_prob, ctr, off = _maps(rng, H, W, blobs)

    pan_ref, _ = rp.get_panoptic_segmentation(
        torch.from_numpy((sem_prob > 0.5).astype(np.int64))[None, None],
        torch.from_numpy(ctr)[None, None],
        torch.from_numpy(off)[None],
        thing_list=[1], label_divisor=1000, stuff_area=stuff_area,
        void_label=0, threshold=0.1, nms_kernel=nms_kernel)
    pan_ref = pan_ref.squeeze().numpy()

    pan_tpu = np.asarray(get_panoptic_segmentation(
        jnp.asarray(sem_prob)[..., None], jnp.asarray(ctr),
        jnp.asarray(np.moveaxis(off, 0, -1)), thing_list=[1],
        label_divisor=1000, stuff_area=stuff_area, void_label=0,
        threshold=0.1, nms_kernel=nms_kernel, max_centers=64))

    agreement = (pan_ref == pan_tpu).mean()
    assert agreement > 0.999, agreement
    pq = PQ(AverageMeter, [1], 1000).calculate(
        {"pan_seg": pan_tpu}, {"pan_seg": pan_ref})[1]
    assert pq > 0.999, pq

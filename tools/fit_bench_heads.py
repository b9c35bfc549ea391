"""Fit MitoNet head classifiers so the random-init bench backbone
genuinely segments the synthetic EM volume.

The benchmark needs realistic *content* flowing through the full
pipeline (runs, matching, consensus — round-2 VERDICT missing #2), with
the exact production MitoNet architecture. Training the 30M-param model
is out of budget, but a closed-form ridge regression from the frozen
random backbone's head features to the known synthetic targets is
deterministic, takes ~2 min on CPU, and reaches sem IoU ~0.75 with
center peaks matching GT — tens of real instances per slice.

Fits (1x1 conv classifiers only):
- semantic_head/Conv_0 -> +-4 logits of the instance mask,
- ins_center/Conv_0   -> gaussian center heatmap,
- ins_xy/Conv_0       -> offsets to instance centroid (full-res units),
- semantic_pr point-head final Dense -> analytic passthrough of the
  coarse logit channel (render = bilinear refinement, no random flips).

Writes configs/bench_heads.npz (a few KB; everything else about the
bench model is the seeded init). Run:
  PYTHONPATH=. python tools/fit_bench_heads.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import os

if __name__ == "__main__":  # fitting runs on CPU; bench imports
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from flax import traverse_util  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "configs",
                   "bench_heads.npz")
NORMS = {"mean": 0.57, "std": 0.12}
H = W = 512
FIT_SLICES = 6


def bench_model_variables():
    """EXACTLY the bench.py model + init (seed 0, 128^2 zeros)."""
    import jax

    from empanada_tpu.models import create_model

    model = create_model("PanopticBiFPNPR", encoder="regnety_6p4gf",
                         num_classes=1, dtype="float32")
    variables = model.init(
        {"params": jax.random.key(0), "points": jax.random.key(1),
         "dropout": jax.random.key(2)},
        np.zeros((1, 128, 128, 1), np.float32), train=False)
    return model, variables


def head_targets(gt_slices):
    """(sem, ctr, off) targets at 1/4 resolution from GT label slices."""
    B = len(gt_slices)
    h4, w4 = H // 4, W // 4
    sem = np.zeros((B, h4, w4), np.float32)
    ctr = np.zeros((B, h4, w4), np.float32)
    off = np.zeros((B, h4, w4, 2), np.float32)
    yy, xx = np.mgrid[:h4, :w4]
    for b, gt in enumerate(gt_slices):
        gt4 = gt[::4, ::4]
        sem[b] = gt4 > 0
        for v in np.unique(gt4):
            if v == 0:
                continue
            m = gt4 == v
            ys, xs = np.nonzero(m)
            cy, cx = ys.mean(), xs.mean()
            ctr[b] = np.maximum(
                ctr[b], np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 8.0))
            off[b, ..., 0][m] = (cy - yy[m]) * 4  # full-res units
            off[b, ..., 1][m] = (cx - xx[m]) * 4
    return sem, ctr, off


def ridge(X, Y, lam=1e-4):
    C = X.shape[-1]
    Xm = X.reshape(-1, C).astype(np.float64)
    Ym = Y.reshape(Xm.shape[0], -1).astype(np.float64)
    XtX = Xm.T @ Xm
    A = XtX + lam * np.trace(XtX) / C * np.eye(C)
    return np.linalg.solve(A, Xm.T @ Ym).astype(np.float32)


def main():
    from empanada_tpu.data.synthetic import synthetic_em_volume

    model, variables = bench_model_variables()

    # fit on MIXED density so the heads hold up at the product's
    # operating point (round-3 VERDICT missing #1: ~200 inst/slice at
    # 512^3): 6 sparse slices (~10 inst/slice, the original bench
    # density) + 6 product-density slices (~200 inst/slice, matching
    # tools/probe_product_scale.py's 512^3 x2400 regime). Heads fit
    # only on sparse content fragmented badly at product density
    # (model found 51 of 207 inst/slice and >90% of slices blew the
    # packed-run budget, /tmp devsess product_512 2026-08-18).
    vol_s, gt_s = synthetic_em_volume((32, H, W), n_instances=48, seed=7)
    vol_d, gt_d = synthetic_em_volume((32, H, W), n_instances=220,
                                      seed=17)

    idx = np.linspace(2, 29, FIT_SLICES).astype(int)
    slices = np.concatenate([vol_s[idx], vol_d[idx]])
    gt_slices = [gt_s[i] for i in idx] + [gt_d[i] for i in idx]
    batch = ((slices.astype(np.float32) / 255.0 - NORMS["mean"])
             / NORMS["std"])[..., None]

    feats = {}
    for start in range(0, len(batch), 2):  # small batches: RAM
        _, inter = model.apply(variables, batch[start:start + 2],
                               train=False, capture_intermediates=True)
        flat = traverse_util.flatten_dict(inter["intermediates"])
        for head in ("semantic_head", "ins_center", "ins_xy"):
            f = np.asarray(flat[(head, "SeparableConvBNAct_0",
                                 "__call__")][0])
            feats.setdefault(head, []).append(f)
    feats = {k: np.concatenate(v) for k, v in feats.items()}

    sem_t, ctr_t, off_t = head_targets(gt_slices)

    w_sem = ridge(feats["semantic_head"], (sem_t * 2 - 1) * 4.0)
    w_ctr = ridge(feats["ins_center"], ctr_t)
    w_off = ridge(feats["ins_xy"], off_t)

    C = w_sem.shape[0]

    # point-head passthrough: final Dense input is
    # [fc features..., coarse_logit]; select the coarse channel
    pr_params = variables["params"]["semantic_pr"]
    ph = pr_params[next(iter(pr_params))]  # StandardPointHead_0
    final_dense = sorted(k for k in ph if k.startswith("Dense"))[-1]
    in_dim, n_cls = ph[final_dense]["kernel"].shape
    w_pr = np.zeros((in_dim, n_cls), np.float32)
    w_pr[-n_cls:] = np.eye(n_cls)

    # fit quality report (overall + per density regime)
    pred = (feats["semantic_head"].reshape(-1, C) @ w_sem).reshape(sem_t.shape)
    iou = (((pred > 0) & (sem_t > 0)).sum()
           / (((pred > 0) | (sem_t > 0)).sum() + 1))
    predc = (feats["ins_center"].reshape(-1, C) @ w_ctr).reshape(ctr_t.shape)
    print(f"sem fit IoU={iou:.3f}  ctr corr="
          f"{np.corrcoef(predc.ravel(), ctr_t.ravel())[0, 1]:.3f}")
    half = FIT_SLICES
    for name, sl in (("sparse", slice(0, half)), ("dense", slice(half, None))):
        p, t = pred[sl], sem_t[sl]
        piou = (((p > 0) & (t > 0)).sum() / (((p > 0) | (t > 0)).sum() + 1))
        print(f"  {name}: sem IoU={piou:.3f}")
    assert iou > 0.5, iou

    np.savez(
        os.path.abspath(OUT),
        sem_kernel=w_sem[None, None], sem_bias=np.zeros(1, np.float32),
        ctr_kernel=w_ctr[None, None], ctr_bias=np.zeros(1, np.float32),
        off_kernel=w_off[None, None], off_bias=np.zeros(2, np.float32),
        pr_kernel=w_pr, pr_bias=np.zeros(n_cls, np.float32),
        norms=np.array([NORMS["mean"], NORMS["std"]], np.float32),
    )
    print(f"wrote {os.path.abspath(OUT)}")


def splice_bench_heads(variables, npz_path=None):
    """Insert the fitted head classifiers into a bench model's variables
    (shared by bench.py and tests)."""
    path = npz_path or os.path.abspath(OUT)
    data = np.load(path)
    params = traverse_util.flatten_dict(variables["params"])
    updates = {
        ("semantic_head", "Conv_0", "kernel"): data["sem_kernel"],
        ("semantic_head", "Conv_0", "bias"): data["sem_bias"],
        ("ins_center", "Conv_0", "kernel"): data["ctr_kernel"],
        ("ins_center", "Conv_0", "bias"): data["ctr_bias"],
        ("ins_xy", "Conv_0", "kernel"): data["off_kernel"],
        ("ins_xy", "Conv_0", "bias"): data["off_bias"],
    }
    pr_head = [k for k in params
               if k[0] == "semantic_pr" and k[-1] == "kernel"]
    final_dense = sorted(pr_head)[-1]
    updates[final_dense] = data["pr_kernel"]
    updates[final_dense[:-1] + ("bias",)] = data["pr_bias"]
    for k, v in updates.items():
        assert k in params and params[k].shape == v.shape, (
            k, v.shape, params.get(k))
        params[k] = v
    out = dict(variables)
    out["params"] = traverse_util.unflatten_dict(params)
    return out


if __name__ == "__main__":
    main()

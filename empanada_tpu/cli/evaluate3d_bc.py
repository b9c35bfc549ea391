"""Boundary-contour 3D inference + evaluation CLI
(reference projects/mitonet/scripts/evaluate3d_bc.py:95-190).

Per-axis BC engine inference accumulates uint8 semantic/contour
probability stacks (scaled by 255 // n_axes so the sum of axes stays in
uint8 range); the summed stacks decode to instances via 3D watershed
(inference/watershed.bc_watershed); a tracker RLE JSON is written and
scored against ground truth."""

from __future__ import annotations

import argparse
import os

import numpy as np

__all__ = ["main", "run_bc_inference3d"]


def run_bc_inference3d(model, volume, *, mode="orthoplane", qlen=3,
                       padding_factor=128, seg_thr=0.9, cnt_thr=0.8,
                       fg_thr=0.85, seed_thres=32, min_size=128,
                       label_divisor=1000, downsample_f=1, progress=True,
                       norms=None):
    """Returns the dense instance labelmap from BC watershed decoding."""
    from empanada_tpu.data import VolumeDataset
    from empanada_tpu.data.utils.transforms import create_augmentations
    from empanada_tpu.inference.engines import BCEngine3d
    from empanada_tpu.inference.watershed import bc_watershed

    tfs = create_augmentations(None, norms=norms) if norms else None

    shape = tuple(volume.shape)
    axes = {"xy": 0} if mode == "stack" else {"xy": 0, "xz": 1, "yz": 2}
    scale = 255 // len(axes)

    # accumulated uint8 probability stacks (semantic, contour)
    sem_stack = np.zeros(shape, dtype=np.uint8)
    cnt_stack = np.zeros(shape, dtype=np.uint8)

    for axis_name, axis in axes.items():
        engine = BCEngine3d(model, median_kernel_size=qlen,
                            padding_factor=padding_factor)
        dataset = VolumeDataset(volume, axis=axis, tfs=tfs,
                                scale=downsample_f)
        n = len(dataset)

        def put(idx, bc):
            bc = np.asarray(bc[0])  # (H, W, 2) float in [0, 1]
            sl = [slice(None)] * 3
            sl[axis] = idx
            sem_stack[tuple(sl)] += (bc[..., 0] * scale).astype(np.uint8)
            cnt_stack[tuple(sl)] += (bc[..., 1] * scale).astype(np.uint8)

        emitted = 0
        for i in range(n):
            ex = dataset[i]
            bc = engine(ex["image"][..., None].astype(np.float32),
                        ex["size"], upsampling=downsample_f)
            if bc is not None:
                put(emitted, bc)
                emitted += 1
        for bc in engine.end(upsampling=downsample_f):
            put(emitted, bc)
            emitted += 1
        assert emitted == n
        if progress:
            print(f"[{axis_name}] {n} slices accumulated")

    seg = bc_watershed(
        np.stack([sem_stack, cnt_stack]),
        thres1=seg_thr, thres2=cnt_thr, thres3=fg_thr,
        seed_thres=seed_thres, min_size=min_size,
        label_divisor=label_divisor)
    return seg


def seg_to_tracker(seg, class_id=1, label_divisor=1000):
    """Dense 3D labelmap -> finished InstanceTracker (for JSON/eval)."""
    from empanada_tpu.core.rle import rle_encode
    from empanada_tpu.inference.tracker import InstanceTracker

    tracker = InstanceTracker(class_id, label_divisor, seg.shape, "xy")
    flat = np.asarray(seg).reshape(-1)
    order = np.argsort(flat, kind="stable")
    sorted_vals = flat[order]
    bounds = np.nonzero(np.concatenate(
        [[True], sorted_vals[1:] != sorted_vals[:-1]]))[0]
    bounds = np.concatenate([bounds, [len(flat)]])
    d, h, w = seg.shape
    for bi in range(len(bounds) - 1):
        label = int(sorted_vals[bounds[bi]])
        if label == 0:
            continue
        coords = np.sort(order[bounds[bi]:bounds[bi + 1]])
        starts, runs = rle_encode(coords)
        z, y, x = np.unravel_index(coords, seg.shape)
        tracker.instances[label] = {
            "box": (int(z.min()), int(y.min()), int(x.min()),
                    int(z.max()) + 1, int(y.max()) + 1, int(x.max()) + 1),
            "starts": starts,
            "runs": runs,
        }
    tracker.finished = True
    return tracker


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="BC-model 3D inference + watershed + evaluation")
    parser.add_argument("config", type=str,
                        help="Exported BC model descriptor yaml")
    parser.add_argument("volume_path", type=str)
    parser.add_argument("gt_json", type=str, nargs="?", default=None)
    parser.add_argument("-mode", type=str, default="orthoplane",
                        choices=["orthoplane", "stack"])
    parser.add_argument("-qlen", type=int, default=3)
    parser.add_argument("-seg-thr", type=float, default=0.9)
    parser.add_argument("-cnt-thr", type=float, default=0.8)
    parser.add_argument("-fg-thr", type=float, default=0.85)
    parser.add_argument("-seed-thres", type=int, default=32)
    parser.add_argument("-min-size", type=int, default=128)
    parser.add_argument("-nmax", type=int, dest="label_divisor",
                        default=1000)
    parser.add_argument("-out-dir", type=str, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from empanada_tpu.data.zarr_store import create_zarr, read_volume
    from empanada_tpu.evaluation.evaluator import default_evaluator
    from empanada_tpu.export import load_exported_model
    from empanada_tpu.inference.engines import JittedModel

    model, desc = load_exported_model(args.config)
    volume = read_volume(args.volume_path)

    seg = run_bc_inference3d(
        model, volume, mode=args.mode, qlen=args.qlen,
        padding_factor=desc.get("padding_factor", 128),
        seg_thr=args.seg_thr, cnt_thr=args.cnt_thr, fg_thr=args.fg_thr,
        seed_thres=args.seed_thres, min_size=args.min_size,
        label_divisor=args.label_divisor, norms=desc.get("norms"))

    out_dir = args.out_dir or os.path.dirname(args.volume_path) or "."
    base = args.volume_path.rstrip("/").rsplit(".zarr", 1)[0]
    out = create_zarr(f"{base}_bc_seg.zarr", tuple(volume.shape),
                      dtype=np.uint32, overwrite=True)
    out[:, :, :] = seg.astype(np.uint32)

    tracker = seg_to_tracker(seg, class_id=desc["labels"][0],
                             label_divisor=args.label_divisor)
    pred_json = os.path.join(out_dir, "pred_bc.json")
    tracker.write_to_json(pred_json)
    print(f"{len(tracker.instances)} instances -> {base}_bc_seg.zarr")

    if args.gt_json:
        results = default_evaluator()(args.gt_json, pred_json)
        for name, value in results.items():
            print(f"{name}: {float(value):.4f}")
        return results


if __name__ == "__main__":
    main()

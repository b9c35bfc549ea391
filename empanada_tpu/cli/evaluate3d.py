"""End-to-end 3D evaluation CLI
(reference projects/mitonet/scripts/evaluate3d.py:99-240): run orthoplane
inference on a volume, dump the consensus tracker JSON, and score it
against a ground-truth tracker JSON."""

from __future__ import annotations

import argparse
import os

__all__ = ["main"]


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Run 3D inference + RLE evaluation vs GT JSON")
    parser.add_argument("config", type=str,
                        help="Exported model descriptor yaml")
    parser.add_argument("volume_path", type=str)
    parser.add_argument("gt_json", type=str,
                        help="Ground-truth tracker JSON")
    parser.add_argument("-out-dir", type=str, default=None)
    parser.add_argument("-class-id", type=int, default=1)
    parser.add_argument("-mode", type=str, default="orthoplane",
                        choices=["orthoplane", "stack"])
    parser.add_argument("-qlen", type=int, default=3)
    parser.add_argument("-nmax", type=int, dest="label_divisor",
                        default=20000)
    parser.add_argument("-seg-thr", type=float, default=0.3)
    parser.add_argument("-nms-thr", type=float, default=0.1)
    parser.add_argument("-nms-kernel", type=int, default=3)
    parser.add_argument("-min-size", type=int, default=500)
    parser.add_argument("-min-span", type=int, default=4)
    parser.add_argument("-pixel-vote-thr", type=int, default=2)
    parser.add_argument("-cluster-iou-thr", type=float, default=0.75)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from empanada_tpu.cli.infer3d import run_inference3d
    from empanada_tpu.data.zarr_store import read_volume
    from empanada_tpu.evaluation.evaluator import default_evaluator
    from empanada_tpu.export import load_exported_model

    model, desc = load_exported_model(args.config)
    volume = read_volume(args.volume_path)

    consensus = run_inference3d(
        model, volume,
        labels=desc["labels"], thing_list=desc["thing_list"],
        mode=args.mode, qlen=args.qlen, label_divisor=args.label_divisor,
        seg_thr=args.seg_thr, nms_thr=args.nms_thr,
        nms_kernel=args.nms_kernel, min_size=args.min_size,
        min_span=args.min_span, pixel_vote_thr=args.pixel_vote_thr,
        cluster_iou_thr=args.cluster_iou_thr,
        padding_factor=desc.get("padding_factor", 128),
        norms=desc.get("norms"),
    )

    out_dir = args.out_dir or os.path.dirname(args.volume_path) or "."
    os.makedirs(out_dir, exist_ok=True)
    pred_json = os.path.join(out_dir, f"pred_class{args.class_id}.json")
    consensus[args.class_id].write_to_json(pred_json)

    results = default_evaluator()(args.gt_json, pred_json)
    for name, value in results.items():
        print(f"{name}: {float(value):.4f}")

    # log results back to the model's training run (reference
    # evaluate3d.py:217-228 mlflow re-attachment)
    if desc.get("run_id"):
        from empanada_tpu.utils.logging import ExperimentLogger

        logger = ExperimentLogger(run_id=desc["run_id"])
        logger.log_metrics({f"eval3d_{k}": float(v)
                            for k, v in results.items()})
        logger.end()
    return results


if __name__ == "__main__":
    main()

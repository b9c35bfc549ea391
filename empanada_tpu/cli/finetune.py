"""Finetuning CLI (reference scripts/finetune.py:55-283).

Finetunes an *exported* model descriptor on new data: the finetune config
names the descriptor under MODEL.config; the descriptor's FINETUNE section
supplies dataset class/criterion/engine; TRAIN controls the schedule and
layer freezing. Re-exports the finetuned model at the end (the reference
saves a new TorchScript file, finetune.py:278)."""

from __future__ import annotations

import argparse
import os

__all__ = ["main"]


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Finetune an exported model")
    parser.add_argument("config", type=str,
                        help="Path to a finetune config yaml")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from empanada_tpu.config import load_config
    from empanada_tpu.export import export_model, load_exported_model
    from empanada_tpu.train import Trainer

    config = load_config(args.config)
    descriptor_path = config["MODEL"]["config"]
    model_jm, desc = load_exported_model(descriptor_path)
    finetune_params = desc.get("FINETUNE", {})

    # build the trainer config from descriptor + finetune yaml
    tcfg = dict(config["TRAIN"])
    tcfg.setdefault("dataset_class",
                    finetune_params.get("dataset_class",
                                        "SingleClassInstanceDataset"))
    tcfg.setdefault("dataset_params",
                    finetune_params.get("dataset_params", {}))
    tcfg.setdefault("criterion",
                    finetune_params.get("criterion", "PanopticLoss"))
    tcfg.setdefault("criterion_params",
                    finetune_params.get("criterion_params", {}))

    trainer_config = {
        "DATASET": {
            "class_names": desc.get("class_names", {}),
            "labels": desc["labels"],
            "thing_list": desc["thing_list"],
            "norms": desc["norms"],
        },
        "MODEL": desc["model_config"],
        "TRAIN": tcfg,
        "EVAL": config.get("EVAL", {
            "engine": finetune_params.get("engine"),
            "engine_params": finetune_params.get("engine_params", {}),
        }),
    }

    trainer = Trainer(trainer_config)
    loader = trainer.build_loader()
    trainer.init_state(steps_per_epoch=len(loader))

    # seed with the exported weights (the whole-pretraining path)
    from flax import serialization

    variables = model_jm.params
    trainer.state = trainer.state.replace(
        params=serialization.from_state_dict(
            trainer.state.params, dict(variables["params"])),
        batch_stats=serialization.from_state_dict(
            trainer.state.batch_stats,
            dict(variables.get("batch_stats", {}))))
    print(f"=> loaded exported weights from {descriptor_path}")

    trainer.fit(loader=loader)

    # re-export
    new_vars = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        new_vars["batch_stats"] = trainer.state.batch_stats
    name = os.path.splitext(os.path.basename(args.config))[0]
    export_model(
        new_vars, desc["model_config"], tcfg.get("model_dir", "."),
        f"{name}_finetuned",
        norms=desc["norms"],
        padding_factor=desc.get("padding_factor", 128),
        thing_list=desc["thing_list"],
        labels=desc["labels"],
        class_names=desc.get("class_names"),
        finetune_params=finetune_params,
    )
    print(f"=> exported finetuned model "
          f"{tcfg.get('model_dir', '.')}/{name}_finetuned.yaml")


if __name__ == "__main__":
    main()

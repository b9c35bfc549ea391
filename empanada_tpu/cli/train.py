"""Training CLI (reference scripts/train.py:69-99).

One process drives all local devices via the jitted data-parallel step;
multi-host runs launch one process per host with jax.distributed
coordinates (replacing torch mp.spawn + NCCL rendezvous).
"""

from __future__ import annotations

import argparse

__all__ = ["main"]


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="empanada_tpu training")
    parser.add_argument("config", type=str, help="Path to a config yaml")
    parser.add_argument("--epochs", type=int, default=None,
                        help="Override TRAIN.schedule_params.epochs")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="Multi-host coordinator address host:port")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from empanada_tpu.config import load_config
    from empanada_tpu.parallel.mesh import initialize_distributed
    from empanada_tpu.train import Trainer
    from empanada_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    initialize_distributed(args.coordinator, args.num_processes,
                           args.process_id)

    config = load_config(args.config)
    assert config["MODEL"]["arch"], "config must name MODEL.arch"

    logger = None
    if config["TRAIN"].get("logging", True):
        import jax

        from empanada_tpu.utils.logging import ExperimentLogger

        if jax.process_index() == 0:
            logger = ExperimentLogger(
                experiment=config["DATASET"].get("dataset_name", "Default"),
                run_name=config["TRAIN"].get("run_name"))
            logger.log_params({
                **{f"MODEL.{k}": v for k, v in config["MODEL"].items()},
                **{f"TRAIN.{k}": v for k, v in config["TRAIN"].items()
                   if not isinstance(v, (list, dict))},
            })

    trainer = Trainer(config)
    trainer.fit(epochs=args.epochs, logger=logger)
    if logger is not None:
        logger.end()


if __name__ == "__main__":
    main()

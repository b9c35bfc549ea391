from empanada_tpu.train.checkpoint import (
    load_checkpoint,
    restore_state,
    save_checkpoint,
)
from empanada_tpu.train.optim import configure_optimizer, create_lr_schedule
from empanada_tpu.train.trainer import TrainState, Trainer

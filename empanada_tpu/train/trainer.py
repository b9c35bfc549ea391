"""Config-driven trainer: jit-compiled data-parallel training over a
device mesh.

The TPU redesign of reference scripts/train.py:69-677. Differences that
matter:

- One process drives all local devices: DDP/SyncBN/AMP are replaced by a
  single jitted train step over a ``data`` mesh — batch sharded on the
  leading axis, params replicated. XLA inserts gradient reductions; batch
  norm reduces over the *global* batch (SyncBN semantics) because the
  computation is written globally.
- Mixed precision = bf16 compute dtype in the model (MODEL.dtype), fp32
  params/loss; no GradScaler needed on TPU.
- Layer freezing (TRAIN.finetune_layer) is an optax.multi_transform mask
  (zero updates for frozen subtrees), matching reference train.py:161-184.
- Checkpoint/resume carries params, batch_stats, opt state, and step
  (reference train.py:321-390).
"""

from __future__ import annotations

import os
import time
from functools import partial

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from flax.training import train_state

from empanada_tpu import losses as losses_mod
from empanada_tpu import metrics as metrics_mod
from empanada_tpu.data import DataLoader, create_dataset
from empanada_tpu.data.utils.sampler import (
    DistributedWeightedSampler,
    WeightedRandomSampler,
)
from empanada_tpu.data.utils.transforms import create_augmentations
from empanada_tpu.models import create_model
from empanada_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated_sharding,
    shard_batch,
)
from empanada_tpu.train.checkpoint import restore_state, save_checkpoint
from empanada_tpu.train.optim import configure_optimizer, create_lr_schedule

__all__ = ["TrainState", "Trainer", "finetune_trainable_mask"]


class TrainState(train_state.TrainState):
    batch_stats: dict = None


def finetune_trainable_mask(params, finetune_layer="all",
                            encoder_key="encoder_mod"):
    """Pytree of bools: True = trainable. Encoder stages below
    finetune_layer freeze (reference train.py:161-184). Accepts both
    resnet ('layerN_*') and regnet ('stageN_*') stage naming."""
    flat = traverse_util.flatten_dict(params)
    valid_layers = ["stage1", "stage2", "stage3", "stage4"]

    def trainable(path):
        if encoder_key not in path:
            return True
        if finetune_layer == "all":
            return True
        if finetune_layer == "none":
            return False
        assert finetune_layer in valid_layers, finetune_layer
        start = valid_layers.index(finetune_layer)
        unfrozen = set()
        for name in valid_layers[start:]:
            unfrozen.add(name)
            unfrozen.add(name.replace("stage", "layer"))
        return any(
            any(p.startswith(u) for u in unfrozen) for p in path)

    mask = {p: trainable(p) for p in flat}
    return traverse_util.unflatten_dict(mask)


def _freeze_wrap(tx, trainable_mask):
    """Zero updates for frozen params."""
    return optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()},
        jax.tree_util.tree_map(
            lambda t: "trainable" if t else "frozen", trainable_mask))


class Trainer:
    """Builds everything from a reference-format config dict and runs the
    epoch loop. All heavy compute happens in one jitted step."""

    def __init__(self, config, mesh=None, seed=0):
        self.config = config
        self.mesh = mesh if mesh is not None else create_mesh()
        self.seed = seed

        mcfg = dict(config["MODEL"])
        self.arch = mcfg.pop("arch")
        self.model = create_model(self.arch, **mcfg)

        tcfg = config["TRAIN"]
        self.criterion = losses_mod.create_loss(
            tcfg.get("criterion", "PanopticLoss"),
            **tcfg.get("criterion_params", {}))

        self.norms = config["DATASET"].get("norms", {"mean": 0.5, "std": 0.29})
        self.batch_size = tcfg.get("batch_size", 8)
        self.finetune_layer = tcfg.get("finetune_layer", "all")
        self._train_step = None
        self.state = None

    # --- data -----------------------------------------------------------

    def build_loader(self):
        tcfg = self.config["TRAIN"]
        dcfg = self.config["DATASET"]
        augs = create_augmentations(
            tcfg.get("augmentations", []), norms=self.norms, seed=self.seed)

        ds_params = dict(tcfg.get("dataset_params", {}))
        name = tcfg.get("dataset_class", "SingleClassInstanceDataset")
        if name == "PanopticDataset":
            ds_params.setdefault("labels", dcfg["labels"])
            ds_params.setdefault("thing_list", dcfg["thing_list"])
            ds_params.setdefault("label_divisor",
                                 tcfg.get("label_divisor", 1000))
        dataset = create_dataset(name, tcfg["train_dir"], transforms=augs,
                                 **ds_params)
        for extra_dir in tcfg.get("additional_train_dirs") or []:
            dataset = dataset + create_dataset(
                name, extra_dir, transforms=augs, **ds_params)

        sampler = None
        if dataset.weights is not None:
            if jax.process_count() > 1:
                sampler = DistributedWeightedSampler(
                    len(dataset), dataset.weights, seed=self.seed)
            else:
                sampler = WeightedRandomSampler(
                    dataset.weights, seed=self.seed)

        return DataLoader(
            dataset, batch_size=self.batch_size, sampler=sampler,
            shuffle=sampler is None, drop_last=True,
            num_workers=tcfg.get("workers", 4), seed=self.seed)

    # --- state ----------------------------------------------------------

    def init_state(self, steps_per_epoch, input_shape=None):
        tcfg = self.config["TRAIN"]
        if input_shape is None:
            crop = _infer_crop(tcfg.get("augmentations", []))
            input_shape = (self.batch_size, crop, crop, 1)

        rngs = {"params": jax.random.key(self.seed),
                "points": jax.random.key(self.seed + 1),
                "dropout": jax.random.key(self.seed + 2)}
        variables = jax.jit(
            partial(self.model.init, train=True),
            static_argnames=())(rngs, jnp.zeros(input_shape, jnp.float32))
        variables = flax.core.unfreeze(variables) \
            if hasattr(flax.core, "unfreeze") else dict(variables)

        # pretrained weights (reference train.py:127-157)
        if tcfg.get("whole_pretraining"):
            from empanada_tpu.export import load_params

            variables = load_params(tcfg["whole_pretraining"],
                                    target=variables)
            print(f"=> loaded whole pretraining "
                  f"{tcfg['whole_pretraining']}")
        elif tcfg.get("encoder_pretraining"):
            from empanada_tpu.train.torch_weights import (
                load_encoder_pretraining,
            )

            variables, norms = load_encoder_pretraining(
                variables, tcfg["encoder_pretraining"])
            if norms:
                self.norms = norms

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        schedule = create_lr_schedule(
            tcfg.get("lr_schedule", "OneCycleLR"), steps_per_epoch,
            **tcfg.get("schedule_params", {"max_lr": 3e-3, "epochs": 1}))
        self.lr_schedule = schedule
        tx = configure_optimizer(
            params, tcfg.get("optimizer", "AdamW"), schedule,
            **tcfg.get("optimizer_params", {}))
        if self.finetune_layer != "all":
            tx = _freeze_wrap(
                tx, finetune_trainable_mask(params, self.finetune_layer))

        state = TrainState.create(
            apply_fn=self.model.apply, params=params, tx=tx,
            batch_stats=batch_stats)
        # replicate across the mesh
        rep = replicated_sharding(self.mesh)
        self.state = jax.device_put(state, rep)

        if tcfg.get("resume"):
            self.state, meta = restore_state(tcfg["resume"], self.state)
            self.start_epoch = int(meta.get("epoch", 0))
            self.resume_run_id = meta.get("run_id")  # re-attach logging
            print(f"=> resumed from {tcfg['resume']} at epoch "
                  f"{self.start_epoch}")
        else:
            self.start_epoch = 0
        return self.state

    # --- steps ----------------------------------------------------------

    def _make_train_step(self):
        criterion = self.criterion
        model = self.model

        def step(state, batch, rng):
            r_points, r_dropout = jax.random.split(rng)

            def loss_fn(params):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                out, mutated = model.apply(
                    variables, batch["image"], train=True,
                    rngs={"points": r_points, "dropout": r_dropout},
                    mutable=["batch_stats"] if state.batch_stats else [])
                total, aux = criterion(out, batch)
                # train-time semantic IoU on device (the reference
                # evaluates IoU on train batches, train.py:500-560)
                if "sem" in batch:
                    logits = out["sem_logits"]
                    if logits.shape[-1] > 1:
                        pred = jnp.argmax(logits, -1) > 0
                    else:
                        pred = logits[..., 0] > 0
                    tgt = batch["sem"] > 0
                    inter = jnp.sum(pred & tgt)
                    union = jnp.sum(pred) + jnp.sum(tgt) - inter
                    aux["sem_iou"] = (inter + 1e-5) / (union + 1e-5)
                return total, (aux, mutated, out)

            (total, (aux, mutated, out)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads=grads)
            if state.batch_stats:
                new_state = new_state.replace(
                    batch_stats=mutated["batch_stats"])
            return new_state, aux

        return jax.jit(step, donate_argnums=(0,))

    def train_step(self, batch, rng):
        if self._train_step is None:
            self._train_step = self._make_train_step()
        batch = {
            k: v for k, v in batch.items()
            if k in ("image", "sem", "ctr_hmp", "offsets", "cnt")
        }
        batch = shard_batch(batch, self.mesh)
        self.state, aux = self._train_step(self.state, batch, rng)
        return aux

    # --- validation -------------------------------------------------------

    def validate(self, logger=None, epoch=None):
        """Panoptic validation on EVAL.eval_dir (reference
        train.py:577-677): run the configured engine on each eval image,
        postprocess BOTH prediction and GT targets to panoptic maps, and
        score the EVAL.metrics (IoU on logits, PQ/F1 on pan segs)."""
        ecfg = self.config.get("EVAL") or {}
        eval_dir = ecfg.get("eval_dir")
        if not eval_dir:
            return {}

        from empanada_tpu.inference.engines import JittedModel, create_engine
        from empanada_tpu.ops.postprocess import get_panoptic_segmentation

        tcfg = self.config["TRAIN"]
        dcfg = self.config["DATASET"]
        augs = create_augmentations(
            [{"aug": "FactorPad", "factor": 128}], norms=self.norms)
        name = tcfg.get("dataset_class", "SingleClassInstanceDataset")
        ds_params = dict(tcfg.get("dataset_params", {}))
        ds_params.pop("weight_gamma", None)
        if name == "PanopticDataset":
            ds_params.setdefault("labels", dcfg["labels"])
            ds_params.setdefault("thing_list", dcfg["thing_list"])
            ds_params.setdefault("label_divisor",
                                 tcfg.get("label_divisor", 1000))
        dataset = create_dataset(name, eval_dir, transforms=augs,
                                 weight_gamma=None, **ds_params)

        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        engine_params = dict(ecfg.get("engine_params", {}))
        engine_params.setdefault("thing_list", dcfg["thing_list"])
        engine = create_engine(
            ecfg.get("engine", "PanopticDeepLabEngine"),
            JittedModel(self.model, variables), **engine_params)

        meters = _build_meters(ecfg.get("metrics", []),
                               dcfg.get("class_names", {}))
        thing_list = engine_params["thing_list"]
        label_divisor = engine_params.get("label_divisor", 1000)
        track_indices = set(ecfg.get("eval_track_indices") or [])
        track_freq = ecfg.get("eval_track_freq", 1)
        snapshot = (logger is not None and track_indices
                    and epoch is not None
                    and (epoch + 1) % max(track_freq, 1) == 0)

        is_bc = not hasattr(engine, "postprocess")  # BCEngine family
        for i in range(len(dataset)):
            ex = dataset[i]
            out = engine.infer(ex["image"][None])
            if is_bc:
                # BC engines emit sigmoid sem/cnt maps only; score the
                # semantic channel (logit sign == prob>0.5) and skip
                # panoptic metrics (no centers/offsets to merge)
                bc = out["bc"]
                sem_logits = bc[..., :1] - 0.5
                meters.evaluate(
                    {"sem_logits": sem_logits},
                    {"sem": jnp.asarray(
                        np.asarray(ex["sem"], np.float32))[None]})
                continue
            if hasattr(engine, "get_instance_cells"):
                # render engines emit ctr/offsets at 1/4 res
                # (coarse_boundaries); group on the coarse grid and
                # merge at full resolution (reference engines.py:300-325)
                cells = engine.get_instance_cells(
                    out["ctr_hmp"], out["offsets"])
                pred_pan = engine.get_panoptic_seg(out["sem"], cells)
            else:
                pred_pan = engine.postprocess(
                    out["sem"], out["ctr_hmp"], out["offsets"])
            if snapshot and i in track_indices:
                _save_eval_snapshot(logger, epoch, i, ex["image"],
                                    np.asarray(pred_pan))
            tgt_sem = np.asarray(ex["sem"], np.float32)
            n_classes = int(self.config["MODEL"].get("num_classes", 1))
            if n_classes > 1:
                # multiclass GT: one-hot probabilities
                tgt_prob = np.stack(
                    [(tgt_sem == c).astype(np.float32)
                     for c in range(n_classes)], axis=-1)
            else:
                tgt_prob = tgt_sem[..., None]
            tgt_pan = get_panoptic_segmentation(
                tgt_prob, ex["ctr_hmp"][..., 0],
                ex["offsets"], thing_list,
                label_divisor=label_divisor,
                stuff_area=engine_params.get("stuff_area", 64),
                void_label=engine_params.get("void_label", 0),
                threshold=engine_params.get("nms_threshold", 0.1),
                nms_kernel=engine_params.get("nms_kernel", 7),
                max_centers=engine_params.get("max_centers", 256))
            meters.evaluate(
                {"sem_logits": out["sem_logits"],
                 "pan_seg": np.asarray(pred_pan)},
                {"sem": jnp.asarray(tgt_sem)[None],
                 "pan_seg": np.asarray(tgt_pan)})

        averages = {
            f"{meters.class_names.get(l, l)}_{mname}": float(v)
            for mname, metric in meters.metrics_dict.items()
            for l, v in metric.average().items()
        }
        if logger is not None and averages:
            logger.log_metrics(averages, step=epoch)
        for k, v in averages.items():
            print(f"eval {k}: {v:.4f}")
        return averages

    # --- loop -----------------------------------------------------------

    def fit(self, epochs=None, loader=None, log_fn=print, logger=None):
        tcfg = self.config["TRAIN"]
        loader = loader or self.build_loader()
        steps_per_epoch = len(loader)
        if steps_per_epoch == 0:
            raise ValueError(
                "empty training loader: fewer images than batch_size "
                f"({self.batch_size}) with drop_last — add data or "
                "reduce TRAIN.batch_size")
        if self.state is None:
            self.init_state(steps_per_epoch)
        epochs = epochs or tcfg.get(
            "schedule_params", {}).get("epochs", 1)
        print_freq = tcfg.get("print_freq", 50)
        save_freq = tcfg.get("save_freq", 1)
        model_dir = tcfg.get("model_dir", ".")

        history = []

        rng = jax.random.key(self.seed + 7)
        global_step = self.start_epoch * steps_per_epoch
        for epoch in range(self.start_epoch, epochs):
            loader.set_epoch(epoch)
            t0 = time.time()
            data_t = 0.0
            last = time.time()
            for i, batch in enumerate(loader):
                data_t += time.time() - last
                rng, step_rng = jax.random.split(rng)
                aux = self.train_step(batch, step_rng)
                global_step += 1
                if (i + 1) % print_freq == 0 or (i + 1) == steps_per_epoch:
                    aux_host = {k: float(v) for k, v in aux.items()}
                    lr = float(self.lr_schedule(global_step))
                    log_fn(f"Epoch [{epoch}][{i + 1}/{steps_per_epoch}] "
                           f"lr {lr:.2e} "
                           + " ".join(f"{k} {v:.4f}"
                                      for k, v in aux_host.items()))
                last = time.time()
            epoch_time = time.time() - t0
            log_fn(f"Epoch {epoch} done in {epoch_time:.1f}s "
                   f"(data wait {data_t:.1f}s)")
            epoch_metrics = {k: float(v) for k, v in aux.items()}
            history.append(epoch_metrics)
            if logger is not None:
                logger.log_metrics(epoch_metrics, step=epoch)

            epochs_per_eval = self.config.get("EVAL", {}).get(
                "epochs_per_eval", 0)
            if jax.process_index() == 0 and epochs_per_eval \
                    and (epoch + 1) % epochs_per_eval == 0:
                self.validate(logger=logger, epoch=epoch)

            if jax.process_index() == 0 and (epoch + 1) % save_freq == 0:
                self.save(f"{model_dir}/{tcfg.get('run_name', 'model')}"
                          f"_checkpoint.msgpack", epoch + 1,
                          run_id=getattr(logger, "run_id", None))
        return history

    def save(self, path, epoch, run_id=None):
        from flax import serialization

        save_checkpoint(
            path, serialization.to_state_dict(self.state),
            metadata={
                "epoch": epoch,
                "arch": self.arch,
                "norms": self.norms,
                "model_config": self.config.get("MODEL", {}),
                "run_id": run_id or getattr(self, "resume_run_id", None),
            })
        print(f"=> saved checkpoint {path}")


def _save_eval_snapshot(logger, epoch, index, image, pan_seg):
    """Side-by-side image/seg PNG logged as a run artifact
    (reference train.py:654-671 mlflow figures)."""
    import cv2

    img = np.asarray(image)[..., 0] if np.asarray(image).ndim == 3 \
        else np.asarray(image)
    img = ((img - img.min()) / max(float(np.ptp(img)), 1e-6) * 255).astype(np.uint8)
    seg = (pan_seg % 251).astype(np.uint8) * 83 % 255
    panel = np.concatenate([img, seg.astype(np.uint8)], axis=1)
    path = os.path.join(logger.artifact_path("snapshots"),
                        f"eval_e{epoch}_i{index}.png")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, panel)
    logger.log_artifact(path)


def _infer_crop(augmentations):
    for aug in augmentations or []:
        if aug.get("aug") in ("RandomCrop", "CenterCrop"):
            return int(aug["height"])
        if aug.get("aug") == "PadIfNeeded":
            return int(aug["min_height"])
    return 256


def _build_meters(metric_specs, class_names):
    metric_dict = {}
    for spec in metric_specs:
        params = {k: v for k, v in spec.items()
                  if k not in ("metric", "name")}
        metric_dict[spec["name"]] = metrics_mod.create_metric(
            spec["metric"], metrics_mod.EMAMeter, **params)
    return metrics_mod.ComposeMetrics(metric_dict, class_names)

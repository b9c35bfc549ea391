"""Optimizers and LR schedules (optax).

Parity with reference scripts/train.py:296-476: registry-by-name
optimizers, OneCycle/cosine/step schedules, and the weight-decay split
that exempts biases and BatchNorm parameters.
"""

from __future__ import annotations

import flax
import jax.numpy as jnp
import optax

__all__ = ["create_lr_schedule", "configure_optimizer", "decay_mask"]


def _one_cycle(total_steps, max_lr, pct_start=0.3, div_factor=25.0,
               final_div_factor=1e4):
    """Cosine-annealed one-cycle LR (torch OneCycleLR semantics,
    anneal_strategy='cos'). Hand-rolled: optax's cosine_onecycle_schedule
    emits NaN when a phase rounds to zero steps."""
    initial = max_lr / div_factor
    final = initial / final_div_factor
    up_steps = max(pct_start * total_steps, 1e-6)
    down_steps = max(total_steps - up_steps, 1e-6)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        up_t = jnp.clip(step / up_steps, 0.0, 1.0)
        up = initial + (max_lr - initial) * 0.5 * (
            1.0 - jnp.cos(jnp.pi * up_t))
        down_t = jnp.clip((step - up_steps) / down_steps, 0.0, 1.0)
        down = final + (max_lr - final) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * down_t))
        return jnp.where(step < up_steps, up, down)

    return schedule


def create_lr_schedule(name, steps_per_epoch, **params):
    """Schedule factory. `steps_per_epoch` resolves the reference's
    steps_per_epoch=-1 convention (train.py:306-312)."""
    if name == "OneCycleLR":
        epochs = params.get("epochs", 1)
        total = max(int(epochs * steps_per_epoch), 2)
        return _one_cycle(
            total_steps=total,
            max_lr=params.get("max_lr", 3e-3),
            pct_start=params.get("pct_start", 0.3),
            div_factor=params.get("div_factor", 25.0),
            final_div_factor=params.get("final_div_factor", 1e4),
        )
    if name == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(
            init_value=params["lr"],
            decay_steps=int(params.get("T_max", 1) * steps_per_epoch))
    if name == "MultiStepLR":
        lr = params["lr"]
        gamma = params.get("gamma", 0.1)
        milestones = {
            int(m * steps_per_epoch): gamma
            for m in params.get("milestones", [])
        }
        return optax.piecewise_constant_schedule(lr, milestones)
    if name in ("constant", "ConstantLR"):
        return optax.constant_schedule(params.get("lr", 1e-3))
    raise ValueError(f"unknown lr schedule {name!r}")


def decay_mask(params):
    """True where weight decay applies: exclude biases and BatchNorm
    scale/bias (reference configure_optimizer, train.py:431-476).

    In flax trees BatchNorm params live under a module path containing
    'BatchNorm' with leaf names 'scale'/'bias'; conv/dense kernels are
    'kernel'.
    """
    flat = flax.traverse_util.flatten_dict(params)

    def use_decay(path):
        leaf = path[-1]
        if leaf == "bias":
            return False
        if any("BatchNorm" in p or "bn" == p for p in path):
            return False
        return True

    mask = {path: use_decay(path) for path in flat}
    return flax.traverse_util.unflatten_dict(mask)


def configure_optimizer(params, opt_name, lr_schedule, grad_clip=None,
                        **opt_params):
    """Build the optax chain for a named optimizer with decay masking."""
    wd = opt_params.pop("weight_decay", 0.0)
    opt_params.pop("lr", None)  # schedule wins
    mask = decay_mask(params) if wd else None

    if opt_name == "AdamW":
        betas = opt_params.pop("betas", (0.9, 0.999))
        tx = optax.adamw(
            learning_rate=lr_schedule, weight_decay=wd, mask=mask,
            b1=betas[0], b2=betas[1],
            **{k: v for k, v in opt_params.items() if k in ("eps",)})
    elif opt_name == "Adam":
        tx = optax.adam(learning_rate=lr_schedule)
        if wd:
            tx = optax.chain(
                optax.add_decayed_weights(wd, mask=mask), tx)
    elif opt_name == "SGD":
        tx = optax.sgd(
            learning_rate=lr_schedule,
            momentum=opt_params.pop("momentum", 0.0),
            nesterov=opt_params.pop("nesterov", False))
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd, mask=mask), tx)
    else:
        raise ValueError(f"unknown optimizer {opt_name!r}")

    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx

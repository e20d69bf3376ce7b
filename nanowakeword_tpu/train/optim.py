"""Optimizers and LR schedules as optax transforms.

Parity target: `_setup_optimizer_and_scheduler`
(`/root/reference/nanowakeword/train/train_model.py:80-144`):
AdamW / Adam / SGD(momentum) optimizers and OneCycle / Cyclic(triangular2) /
CosineAnnealing schedules, driven by the same config keys
(`optimizer_type`, `learning_rate_max`, `learning_rate_base`, `weight_decay`,
`momentum`, `lr_scheduler_type`, `clr_step_size_up/down`, `steps`).

The whole update — global-norm clip 1.0 (train_model.py:555) + optimizer +
schedule — is one optax chain applied inside the jitted train step.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def cyclic_triangular2_schedule(base_lr: float, max_lr: float,
                                step_size_up: int, step_size_down: int):
    """torch CyclicLR(mode='triangular2'): triangle wave whose amplitude
    halves each cycle (train_model.py:110-120)."""
    cycle_len = step_size_up + step_size_down

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        cycle = jnp.floor(count / cycle_len)
        pos = count - cycle * cycle_len
        up = pos / step_size_up
        down = 1.0 - (pos - step_size_up) / step_size_down
        frac = jnp.where(pos < step_size_up, up, down)
        amplitude = (max_lr - base_lr) * (0.5 ** cycle)
        return base_lr + amplitude * jnp.clip(frac, 0.0, 1.0)

    return schedule


def build_schedule(config, total_steps: int):
    """lr_scheduler_type -> optax schedule fn (train_model.py:104-144)."""
    sched_type = str(config.get("lr_scheduler_type", "onecycle")).lower()
    max_lr = float(config.get("learning_rate_max", 1e-4))

    if sched_type == "cyclic":
        step_up = int(config["clr_step_size_up"])
        step_down = int(config.get("clr_step_size_down", step_up))
        return cyclic_triangular2_schedule(
            float(config["learning_rate_base"]), max_lr, step_up, step_down)
    if sched_type == "onecycle":
        # torch OneCycleLR defaults: cos anneal, pct_start .3, div_factor 25,
        # final_div_factor 1e4
        return optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=max_lr,
            pct_start=0.3, div_factor=25.0, final_div_factor=1e4)
    if sched_type == "cosine":
        eta_min = float(config.get("learning_rate_base", 1e-6))
        return optax.cosine_decay_schedule(
            init_value=max_lr, decay_steps=total_steps,
            alpha=eta_min / max_lr)
    raise ValueError(
        f"Unsupported lr_scheduler_type: '{sched_type}'. "
        "Supported types are: 'cyclic', 'onecycle', 'cosine'.")


def build_optimizer(config, total_steps: int,
                    grad_clip: float = 1.0) -> optax.GradientTransformation:
    """optimizer_type -> optax chain with the schedule and grad clipping."""
    opt_type = str(config.get("optimizer_type", "adamw")).lower()
    weight_decay = float(config.get("weight_decay", 1e-2))
    momentum = float(config.get("momentum", 0.9))
    schedule = build_schedule(config, total_steps)

    if opt_type == "adam":
        # torch Adam's weight_decay is L2 added to the gradient
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(),
            optax.scale_by_learning_rate(schedule))
    elif opt_type == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum),
            optax.scale_by_learning_rate(schedule))
    else:  # adamw (default)
        opt = optax.adamw(learning_rate=schedule, weight_decay=weight_decay)

    if grad_clip and grad_clip > 0:
        return optax.chain(optax.clip_by_global_norm(grad_clip), opt)
    return opt

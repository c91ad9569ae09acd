"""Optimizers and LR schedules (optax).

Capability parity with the reference trainer (train.py:457-471 — SGD with
momentum + weight decay, or Adam) PLUS the warmup/cosine/cyclical schedule
the reference declares but never wires up (training_utils.py:283-336;
`use_cosine_scheduler` is inert upstream — here it actually drives the
optimizer when enabled, fixing that defect).
"""

from __future__ import annotations

import math
from typing import Any

import optax


def get_lr(it: int, *, cfg: Any) -> float:
    """Warmup → (optional) cosine decay → (optional) cyclical modulation.

    Behavior-compatible with training_utils.get_lr:283-336: linear warmup is
    1-based; past `lr_decay_iters` the rate floors at `min_lr`; cyclical
    modulation is a sine factor applied after warmup; final clamp to
    `min_lr` except during warmup.
    """
    lr = cfg.learning_rate
    warmup = getattr(cfg, "warmup_iters", 0)
    decay_iters = getattr(cfg, "lr_decay_iters", 0)
    min_lr = getattr(cfg, "min_lr", 0.0)
    decay = getattr(cfg, "decay_lr", True)

    if it < warmup:
        base = lr * (it + 1) / warmup if warmup > 0 else lr
    elif decay_iters and it > decay_iters:
        base = min_lr
    elif not decay or not decay_iters:
        base = lr
    else:
        ratio = (it - warmup) / (decay_iters - warmup)
        coeff = 0.5 * (1.0 + math.cos(math.pi * ratio))
        base = min_lr + coeff * (lr - min_lr)

    final = base
    if getattr(cfg, "use_cyclical_lr", False) and it >= warmup:
        period = cfg.cyclical_lr_period
        amplitude = cfg.cyclical_lr_amplitude
        progress = ((it - warmup) % period) / period
        final *= 1.0 + amplitude * math.sin(2 * math.pi * progress)

    if it < warmup:
        return final
    return max(min_lr, final)


def make_schedule(cfg: Any, steps_per_epoch: int) -> optax.Schedule:
    """An optax schedule realizing the config's LR policy.

    `use_cosine_scheduler` (config surface, e.g. config/train_nnue.py)
    enables cosine annealing over the full run; warmup_iters/min_lr are
    honored when present.
    """
    if not getattr(cfg, "use_cosine_scheduler", False):
        return lambda _: cfg.learning_rate

    total = getattr(cfg, "lr_decay_iters", 0) or max(
        1, steps_per_epoch * getattr(cfg, "max_epochs", 1)
    )

    class _Shim:
        learning_rate = cfg.learning_rate
        warmup_iters = getattr(cfg, "warmup_iters", 0)
        lr_decay_iters = total
        min_lr = getattr(cfg, "min_lr", 0.0)
        decay_lr = getattr(cfg, "decay_lr", True)
        use_cyclical_lr = getattr(cfg, "use_cyclical_lr", False)
        cyclical_lr_period = getattr(cfg, "cyclical_lr_period", 1000)
        cyclical_lr_amplitude = getattr(cfg, "cyclical_lr_amplitude", 0.1)

    # optax schedules receive traced step counts; get_lr is pure python, so
    # wrap it with a host-independent formulation via optax primitives when
    # cyclical is off, else sample it densely (it's cheap & precomputed).
    shim = _Shim()
    if not shim.use_cyclical_lr:
        warmup = shim.warmup_iters
        cosine = optax.cosine_decay_schedule(
            init_value=cfg.learning_rate,
            decay_steps=max(1, total - warmup),
            alpha=shim.min_lr / cfg.learning_rate if cfg.learning_rate else 0.0,
        )
        if warmup > 0:
            return optax.join_schedules(
                [
                    optax.linear_schedule(
                        cfg.learning_rate / max(1, warmup), cfg.learning_rate, warmup
                    ),
                    cosine,
                ],
                [warmup],
            )
        return cosine

    import numpy as np
    import jax.numpy as jnp

    table = np.array([get_lr(i, cfg=shim) for i in range(total + 1)], np.float32)
    table_j = jnp.asarray(table)

    def sched(step):
        idx = jnp.clip(step, 0, total)
        return table_j[idx]

    return sched


def create_optimizer(cfg: Any, steps_per_epoch: int = 1) -> optax.GradientTransformation:
    """SGD(momentum, weight_decay) or Adam(weight_decay), per config.

    Matches torch semantics: weight decay is added to the gradient BEFORE
    the momentum trace (torch.optim.SGD), which is optax's
    `add_decayed_weights` → `sgd` chaining order. Gradient clipping by
    global norm is applied first when `max_grad_norm > 0` (train.py:363).
    """
    schedule = make_schedule(cfg, steps_per_epoch)
    parts = []
    max_grad_norm = getattr(cfg, "max_grad_norm", 0.0)
    if max_grad_norm and max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    wd = getattr(cfg, "weight_decay", 0.0)
    if getattr(cfg, "optimizer_type", "adam") == "sgd":
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(
            optax.sgd(learning_rate=schedule, momentum=getattr(cfg, "momentum", 0.9))
        )
    else:
        # torch.optim.Adam's weight_decay is L2-into-gradient (not AdamW).
        if wd:
            parts.append(optax.add_decayed_weights(wd))
        parts.append(optax.adam(learning_rate=schedule))
    return optax.chain(*parts)
